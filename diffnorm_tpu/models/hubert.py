"""HuBERT speech encoder for mHuBERT feature extraction.

Capability parity with fairseq/models/hubert/hubert.py (HubertModel.
extract_features) + the feature-dump driver
(examples/textless_nlp/gslm/speech2unit/pretrained/hubert_feature_reader.py:43-62):

* conv feature extractor: 7 strided conv layers
  [(512,10,5), (512,3,2)x4, (512,2,2)x2] -> 320x downsample, group-norm on
  the first layer, GELU
* post-extract projection 512 -> 768, layer-norm
* transformer encoder: 12 layers, 768 dim, 12 heads, 3072 FFN, GELU,
  conv positional embedding (kernel 128, 16 groups)
* `extract_features(output_layer=11)` returns the layer-11 output — the
  features DiffNorm quantizes

Weights come from a converted mHuBERT torch checkpoint
(utils/convert_weights.py). The whole waveform->features->units pipeline
compiles into one XLA graph together with the k-means matmul-argmin
(models/kmeans.py) — the BASELINE "fused preprocessing graph".
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

CONV_LAYERS = ((512, 10, 5),) + ((512, 3, 2),) * 4 + ((512, 2, 2),) * 2


class ConvFeatureExtractor(nn.Module):
    """Waveform [B, T] -> [B, frames, 512] (wav2vec2.py
    ConvFeatureExtractionModel:820-899). `mode="default"` (base models):
    group-norm (512 groups = per-channel instance norm) on layer 0 only, no
    biases. `mode="layer_norm"` (wav2vec2-large/XLSR `--extractor-mode
    layer_norm`): per-timestep LayerNorm over channels after EVERY conv,
    optional conv biases (`--conv-bias`)."""

    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS
    mode: str = "default"
    conv_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        assert self.mode in ("default", "layer_norm"), self.mode
        x = wav[:, :, None]  # [B, T, 1]
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            x = nn.Conv(
                dim, kernel_size=(k,), strides=(stride,), padding="VALID",
                use_bias=self.conv_bias, dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if self.mode == "layer_norm":
                # reference Fp32LayerNorm in a TransposeLast sandwich:
                # normalize over the channel dim in f32
                x = nn.LayerNorm(
                    epsilon=1e-5, dtype=jnp.float32, name=f"ln_{i}",
                )(x).astype(x.dtype)
            elif i == 0:
                x = nn.GroupNorm(
                    num_groups=dim, epsilon=1e-5, dtype=self.dtype,
                    name="group_norm",
                )(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class ConvPositionalEmbedding(nn.Module):
    """Grouped conv positional embedding (wav2vec2-style): kernel 128,
    16 groups, weight-normalized in torch — folded at conversion time."""

    dim: int = 768
    kernel: int = 128
    groups: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.kernel // 2
        h = nn.Conv(
            self.dim, kernel_size=(self.kernel,), padding=[(pad, pad)],
            feature_group_count=self.groups, dtype=self.dtype, name="conv",
        )(x)
        if self.kernel % 2 == 0:
            h = h[:, :-1]
        return jax.nn.gelu(h, approximate=False)


class TransformerSentenceEncoderLayer(nn.Module):
    """Post-norm transformer layer (wav2vec2/HuBERT-base default:
    layer_norm_first=False). Dropouts follow the reference layer
    (wav2vec2.py TransformerSentenceEncoderLayer): attention-prob dropout
    inside MHA, activation dropout after the fc1 GELU, residual dropout
    after out_proj and fc2 — all 0 by default so the inference-only users
    (feature dump, CTC head) are unchanged."""

    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    # wav2vec2/hubert LARGE models: pre-norm layers (wav2vec2.py
    # TransformerSentenceEncoderLayer forward :1235-1290)
    layer_norm_first: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        from diffnorm_tpu.ops.attention import masked_attention

        h = self.heads
        d = self.dim // h
        b, t, _ = x.shape
        attn_ln = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")
        final_ln = nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")

        def attention(z):
            q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(z)
            k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(z)
            v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(z)

            def heads_of(y):
                return y.reshape(b, t, h, d).transpose(0, 2, 1, 3)

            attn_rng = None
            if not deterministic and self.attention_dropout > 0.0:
                attn_rng = self.make_rng("dropout")
            a = masked_attention(
                heads_of(q), heads_of(k), heads_of(v), mask=mask,
                dropout=0.0 if deterministic else self.attention_dropout,
                dropout_rng=attn_rng,
            )
            a = a.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
            a = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(a)
            return nn.Dropout(self.dropout)(a, deterministic=deterministic)

        def ffn(z):
            h2 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(z)
            h2 = jax.nn.gelu(h2, approximate=False)
            h2 = nn.Dropout(self.activation_dropout)(
                h2, deterministic=deterministic)
            h2 = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h2)
            return nn.Dropout(self.dropout)(h2, deterministic=deterministic)

        if self.layer_norm_first:
            x = x + attention(attn_ln(x))
            return x + ffn(final_ln(x))
        x = attn_ln(x + attention(x))
        return final_ln(x + ffn(x))


class HubertEncoder(nn.Module):
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    conv_dim: int = 512
    # --conv-feature-layers (fairseq wav2vec2/hubert flag): the extractor's
    # (channels, kernel, stride) spec; None = the released-model default
    conv_feature_layers: Optional[Sequence[Tuple[int, int, int]]] = None
    extractor_mode: str = "default"
    conv_bias: bool = False
    # LARGE models: pre-norm layers; the encoder-level LayerNorm moves
    # AFTER the stack and is skipped for intermediate output_layer taps
    # (wav2vec2.py TransformerEncoder forward :1000-1030)
    layer_norm_first: bool = False
    # training-time knobs (reference hubert.py/wav2vec2.py defaults are
    # nonzero only for pretraining; 0 keeps the inference users unchanged)
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    dropout_input: float = 0.0
    layerdrop: float = 0.0
    feature_grad_mult: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav, output_layer: Optional[int] = None, mask=None,
                 deterministic: bool = True, mask_indices=None, mask_emb=None,
                 channel_mask=None, return_features: bool = False,
                 return_normed: bool = False):
        """wav: [B, T] float32 (16 kHz). Returns [B, frames, dim] features
        from `output_layer` (1-based; None = final).

        Pretraining hooks (reference hubert.py forward :432-470):
        `mask_indices` [B, frames] bool + `mask_emb` [dim] replace masked
        frames with the learned mask embedding after post_extract_proj;
        `return_features` additionally returns the raw conv-extractor
        output (for the features_pen penalty); `feature_grad_mult` scales
        the gradient flowing into the conv extractor (GradMultiply)."""
        feats = ConvFeatureExtractor(
            conv_layers=tuple(self.conv_feature_layers or CONV_LAYERS),
            mode=self.extractor_mode, conv_bias=self.conv_bias,
            dtype=self.dtype, name="feature_extractor")(wav)
        if self.feature_grad_mult != 1.0:
            if self.feature_grad_mult == 0.0:
                feats = jax.lax.stop_gradient(feats)
            else:
                # GradMultiply: identity forward, scaled backward
                g = self.feature_grad_mult
                feats = feats * g + jax.lax.stop_gradient(feats * (1.0 - g))
        raw_features = feats
        feats = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(feats)
        # wav2vec2's contrastive targets are the layer-normed (pre-proj)
        # features ("unmasked_features", wav2vec2.py:603-604)
        normed_features = feats
        x = nn.Dense(self.dim, dtype=self.dtype, name="post_extract_proj")(feats)
        x = nn.Dropout(self.dropout_input)(x, deterministic=deterministic)
        if mask_indices is not None:
            x = jnp.where(mask_indices[:, :, None],
                          mask_emb.astype(x.dtype)[None, None, :], x)
        if channel_mask is not None:
            # fine-tune channel SpecAugment (hubert_asr via wav2vec2
            # apply_mask :461-480): zero masked embedding channels across
            # all timesteps
            x = jnp.where(channel_mask[:, None, :], 0.0, x)

        if mask is not None:
            # reference wav2vec2.py TransformerEncoder forward :1017-1018
            # zeroes padded positions before the conv positional embedding
            # (otherwise pos_conv smears tail garbage into valid frames)
            x = jnp.where(mask[:, :, None], x, 0.0)
        x = x + ConvPositionalEmbedding(
            dim=self.dim, dtype=self.dtype, name="pos_conv"
        )(x)
        enc_ln = nn.LayerNorm(dtype=self.dtype, name="encoder_layer_norm")
        if not self.layer_norm_first:
            x = enc_ln(x)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)

        n = self.layers if output_layer is None else min(output_layer, self.layers)
        for i in range(self.layers):
            if i >= n:
                break
            y = TransformerSentenceEncoderLayer(
                dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim,
                dropout=self.dropout,
                attention_dropout=self.attention_dropout,
                activation_dropout=self.activation_dropout,
                layer_norm_first=self.layer_norm_first,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask=mask, deterministic=deterministic)
            if self.layerdrop > 0.0 and not deterministic:
                # fairseq LayerDrop: drop the whole layer with prob p (no
                # rescale at train; eval keeps all layers)
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - self.layerdrop)
                x = jnp.where(keep, y, x)
            else:
                x = y
        if self.layer_norm_first and output_layer is None:
            # reference applies the encoder LN at the END for pre-norm
            # stacks, and only on the full-depth output (forward :1003-1005)
            x = enc_ln(x)
        if return_normed:
            return x, raw_features, normed_features
        if return_features:
            return x, raw_features
        return x


def frames_for_samples(n_samples: int, conv_layers=None) -> int:
    """Output frame count of the conv extractor for a waveform length."""
    n = n_samples
    for _, k, s in (conv_layers or CONV_LAYERS):
        n = (n - k) // s + 1
    return n


def frame_lengths(lengths, conv_layers=None):
    """jnp frames_for_samples: conv-extractor output lengths per row."""
    n = lengths.astype(jnp.int32)
    for _, k, s in (conv_layers or CONV_LAYERS):
        n = (n - k) // s + 1
    return jnp.maximum(n, 0)


class HubertCTCModule(nn.Module):
    """HuBERT encoder + linear CTC head (reference HubertCtc / HubertEncoder,
    fairseq/models/hubert/hubert_asr.py:251-334: w2v_model.extract_features
    -> final_dropout -> proj to len(dictionary)). Fine-tuning takes raw
    16 kHz waveform [B, T(, 1)] and emits per-frame letter logits; pairs
    with the `ctc` criterion and the audio_finetuning task."""

    vocab_size: int
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    final_dropout: float = 0.0
    # fine-tune regularization (reference hubert_asr.py HubertAsrConfig:
    # dropout/attention/activation dropouts, LayerDrop, SpecAugment-style
    # time+channel masking via apply_mask, frozen conv extractor
    # feature_grad_mult=0 — all 0/off by default so inference users and
    # existing checkpoints are unchanged)
    dropout: float = 0.0
    attention_dropout: float = 0.0
    activation_dropout: float = 0.0
    layerdrop: float = 0.0
    feature_grad_mult: float = 0.0
    apply_mask: bool = False
    conv_feature_layers: Optional[Sequence[Tuple[int, int, int]]] = None
    extractor_mode: str = "default"
    conv_bias: bool = False
    layer_norm_first: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = HubertEncoder(
            dim=self.dim, layers=self.layers, heads=self.heads,
            ffn_dim=self.ffn_dim,
            conv_feature_layers=self.conv_feature_layers,
            extractor_mode=self.extractor_mode, conv_bias=self.conv_bias,
            layer_norm_first=self.layer_norm_first,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            layerdrop=self.layerdrop,
            feature_grad_mult=self.feature_grad_mult,
            dtype=self.dtype, name="w2v_model",
        )
        self.proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")
        self.dropout_mod = nn.Dropout(self.final_dropout)
        if self.apply_mask:
            # the fine-tune time mask substitutes the backbone's learned
            # mask embedding (hubert_asr reuses the pretrained mask_emb)
            self.mask_emb = self.param(
                "mask_emb", nn.initializers.uniform(scale=1.0), (self.dim,))

    def __call__(self, src, src_lengths, deterministic: bool = True,
                 mask_indices=None, channel_mask=None):
        wav = src[..., 0] if src.ndim == 3 else src
        out_lengths = frame_lengths(src_lengths, self.conv_feature_layers)
        n_frames = frames_for_samples(wav.shape[1], self.conv_feature_layers)
        mask = jnp.arange(n_frames)[None, :] < out_lengths[:, None]
        # masking only at train time (reference: mask = apply_mask and
        # self.training, hubert_asr.py:310)
        use_mask = self.apply_mask and not deterministic
        x = self.encoder(
            wav, mask=mask, deterministic=deterministic,
            mask_indices=mask_indices if use_mask else None,
            mask_emb=self.mask_emb if use_mask else None,
            channel_mask=channel_mask if use_mask else None,
        )
        x = self.dropout_mod(x, deterministic=deterministic)
        logits = self.proj(x)
        return dict(logits=logits, logit_lengths=out_lengths, mask=mask)


class HubertPretrainModule(nn.Module):
    """HuBERT masked-unit pretraining (reference hubert.py HubertModel
    forward :432-527 + compute_nce :384-395).

    TPU-first redesign: the reference gathers masked frames into
    dynamic-shaped [n_masked, D] tensors and builds (K+1)-way NCE logits
    [positive; all K label embeddings] with duplicate-of-positive rows
    masked to -inf. Since the "negatives" are ALWAYS the full embedding
    table and the positive row is masked out of it, that softmax is
    mathematically identical to a K-way softmax over the label-embedding
    cosines with target = the true label. We therefore compute ONE
    static-shaped [B, T, K] cosine logit tensor (an MXU matmul over all
    frames) and let the criterion weight the cross-entropy by
    masked/unmasked validity — no dynamic shapes, no gathers
    (equivalence pinned against the real reference model in
    tests/test_hubert_pretrain.py).

    Single-target only: the multi-label `target_list` generality is unused
    by every released HuBERT recipe (one k-means label set per iteration);
    `untie_final_proj`/`target_glu` likewise default off and are omitted.
    """

    num_classes: int
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    final_dim: int = 256
    logit_temp: float = 0.1
    feature_grad_mult: float = 0.1
    dropout_input: float = 0.1
    dropout: float = 0.1
    attention_dropout: float = 0.1
    activation_dropout: float = 0.0
    layerdrop: float = 0.05
    conv_feature_layers: Optional[Sequence[Tuple[int, int, int]]] = None
    extractor_mode: str = "default"
    conv_bias: bool = False
    layer_norm_first: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = HubertEncoder(
            dim=self.dim, layers=self.layers, heads=self.heads,
            ffn_dim=self.ffn_dim,
            conv_feature_layers=self.conv_feature_layers,
            extractor_mode=self.extractor_mode, conv_bias=self.conv_bias,
            layer_norm_first=self.layer_norm_first,
            dropout=self.dropout,
            attention_dropout=self.attention_dropout,
            activation_dropout=self.activation_dropout,
            dropout_input=self.dropout_input,
            layerdrop=self.layerdrop,
            feature_grad_mult=self.feature_grad_mult,
            dtype=self.dtype, name="encoder",
        )
        # reference inits: mask_emb ~ U[0,1); label_embs_concat ~ U[0,1)
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0), (self.dim,))
        self.final_proj = nn.Dense(
            self.final_dim, dtype=self.dtype, name="final_proj")
        self.label_embs_concat = self.param(
            "label_embs_concat", nn.initializers.uniform(scale=1.0),
            (self.num_classes, self.final_dim))

    def __call__(self, src, src_lengths, mask_indices,
                 deterministic: bool = True):
        """src: [B, T(, 1)] 16 kHz waveform; mask_indices: [B, frames] bool
        (drawn host-side by the task with utils.masking.compute_mask_indices
        — reference apply_mask :337-358). Returns frame logits [B, F, K]
        (cosine / logit_temp, f32), the conv feature penalty, and the valid
        frame mask."""
        wav = src[..., 0] if src.ndim == 3 else src
        out_lengths = frame_lengths(src_lengths, self.conv_feature_layers)
        n_frames = frames_for_samples(wav.shape[1], self.conv_feature_layers)
        valid = jnp.arange(n_frames)[None, :] < out_lengths[:, None]
        x, raw_features = self.encoder(
            wav, mask=valid, deterministic=deterministic,
            mask_indices=mask_indices, mask_emb=self.mask_emb,
            return_features=True,
        )
        # reference :441: features.float().pow(2).mean() over ALL positions
        features_pen = jnp.mean(
            jnp.square(raw_features.astype(jnp.float32)))
        proj = self.final_proj(x).astype(jnp.float32)
        embs = self.label_embs_concat.astype(jnp.float32)
        proj = proj / jnp.maximum(
            jnp.linalg.norm(proj, axis=-1, keepdims=True), 1e-8)
        embs = embs / jnp.maximum(
            jnp.linalg.norm(embs, axis=-1, keepdims=True), 1e-8)
        logits = jnp.einsum(
            "bfd,kd->bfk", proj, embs,
            preferred_element_type=jnp.float32) / self.logit_temp
        return dict(
            logits=logits, features_pen=features_pen, mask=valid,
            mask_indices=mask_indices, logit_lengths=out_lengths,
        )


@register_model("hubert")
class HubertPretrainModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg, task=None) -> "HubertPretrainModel":
        num_classes = cfg.get("num_classes")
        if num_classes is None and task is not None and (
                task.target_dictionary is not None):
            num_classes = len(task.target_dictionary)
        module = HubertPretrainModule(
            num_classes=num_classes or 504,
            dim=cfg.get("encoder_embed_dim", 768),
            layers=cfg.get("encoder_layers", 12),
            heads=cfg.get("encoder_attention_heads", 12),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 3072),
            final_dim=cfg.get("final_dim", 256),
            logit_temp=cfg.get("logit_temp", 0.1),
            feature_grad_mult=cfg.get("feature_grad_mult", 0.1),
            dropout_input=cfg.get("dropout_input", 0.1),
            dropout=cfg.get("dropout", 0.1),
            attention_dropout=cfg.get("attention_dropout", 0.1),
            activation_dropout=cfg.get("activation_dropout", 0.0),
            layerdrop=cfg.get("encoder_layerdrop", 0.05),
            conv_feature_layers=_parse_conv_spec(
                cfg.get("conv_feature_layers")),
            extractor_mode=cfg.get("extractor_mode", "default"),
            conv_bias=bool(cfg.get("conv_bias", False)),
            layer_norm_first=bool(cfg.get("layer_norm_first", False)),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("hubert", "hubert")
@register_architecture("hubert", "hubert_base")
def hubert_base_arch(cfg):
    cfg.setdefault("encoder_embed_dim", 768)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 12)
    cfg.setdefault("encoder_ffn_embed_dim", 3072)
    cfg.setdefault("final_dim", 256)


@register_architecture("hubert", "hubert_large")
def hubert_large_arch(cfg):
    """hubert_large_librivox.yaml: pre-norm 24L/1024d, layer_norm
    extractor."""
    cfg.setdefault("encoder_embed_dim", 1024)
    cfg.setdefault("encoder_layers", 24)
    cfg.setdefault("encoder_attention_heads", 16)
    cfg.setdefault("encoder_ffn_embed_dim", 4096)
    cfg.setdefault("final_dim", 768)
    cfg.setdefault("extractor_mode", "layer_norm")
    cfg.setdefault("layer_norm_first", True)


def _parse_conv_spec(spec):
    """fairseq --conv-feature-layers: "[(512,10,5), (512,3,2), ...]"."""
    if spec is None or isinstance(spec, (tuple, list)):
        return spec
    import ast

    return tuple(tuple(t) for t in ast.literal_eval(str(spec)))


@register_model("hubert_ctc")
class HubertCTCModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg, task=None) -> "HubertCTCModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = HubertCTCModule(
            vocab_size=vocab or 32,
            dim=cfg.get("encoder_embed_dim", 768),
            layers=cfg.get("encoder_layers", 12),
            heads=cfg.get("encoder_attention_heads", 12),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 3072),
            final_dropout=cfg.get("final_dropout", 0.0),
            dropout=cfg.get("dropout", 0.0),
            attention_dropout=cfg.get("attention_dropout", 0.0),
            activation_dropout=cfg.get("activation_dropout", 0.0),
            layerdrop=cfg.get("encoder_layerdrop", 0.0),
            feature_grad_mult=cfg.get("feature_grad_mult", 0.0),
            apply_mask=bool(cfg.get("apply_mask", False)),
            conv_feature_layers=_parse_conv_spec(
                cfg.get("conv_feature_layers")),
            extractor_mode=cfg.get("extractor_mode", "default"),
            conv_bias=bool(cfg.get("conv_bias", False)),
            layer_norm_first=bool(cfg.get("layer_norm_first", False)),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("hubert_ctc", "hubert_ctc")
# fairseq name aliases: wav2vec2_asr.py registers the CTC fine-tune wrapper
# as `wav2vec_ctc`; the backbone is the same conv-extractor + transformer
# encoder this module wraps, so reference recipe flags resolve unchanged
@register_architecture("hubert_ctc", "wav2vec_ctc")
def hubert_ctc_arch(cfg):
    cfg.setdefault("encoder_embed_dim", 768)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 12)
    cfg.setdefault("encoder_ffn_embed_dim", 3072)
