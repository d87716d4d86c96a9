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
    """Waveform [B, T] -> [B, frames, 512]; default mode: group-norm (512
    groups = per-channel instance norm) on layer 0 only, no biases."""

    conv_layers: Sequence[Tuple[int, int, int]] = CONV_LAYERS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        x = wav[:, :, None]  # [B, T, 1]
        for i, (dim, k, stride) in enumerate(self.conv_layers):
            x = nn.Conv(
                dim, kernel_size=(k,), strides=(stride,), padding="VALID",
                use_bias=False, dtype=self.dtype, name=f"conv_{i}",
            )(x)
            if i == 0:
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
    layer_norm_first=False)."""

    dim: int = 768
    heads: int = 12
    ffn_dim: int = 3072
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        from diffnorm_tpu.ops.attention import masked_attention

        h = self.heads
        d = self.dim // h
        q = nn.Dense(self.dim, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(self.dim, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(self.dim, dtype=self.dtype, name="v_proj")(x)
        b, t, _ = x.shape

        def heads_of(z):
            return z.reshape(b, t, h, d).transpose(0, 2, 1, 3)

        attn = masked_attention(heads_of(q), heads_of(k), heads_of(v), mask=mask)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, self.dim)
        attn = nn.Dense(self.dim, dtype=self.dtype, name="out_proj")(attn)
        x = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")(x + attn)
        h2 = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h2 = jax.nn.gelu(h2, approximate=False)
        h2 = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h2)
        return nn.LayerNorm(dtype=self.dtype, name="final_layer_norm")(x + h2)


class HubertEncoder(nn.Module):
    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    conv_dim: int = 512
    # --conv-feature-layers (fairseq wav2vec2/hubert flag): the extractor's
    # (channels, kernel, stride) spec; None = the released-model default
    conv_feature_layers: Optional[Sequence[Tuple[int, int, int]]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav, output_layer: Optional[int] = None, mask=None):
        """wav: [B, T] float32 (16 kHz). Returns [B, frames, dim] features
        from `output_layer` (1-based; None = final)."""
        feats = ConvFeatureExtractor(
            conv_layers=tuple(self.conv_feature_layers or CONV_LAYERS),
            dtype=self.dtype, name="feature_extractor")(wav)
        feats = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(feats)
        x = nn.Dense(self.dim, dtype=self.dtype, name="post_extract_proj")(feats)

        x = x + ConvPositionalEmbedding(
            dim=self.dim, dtype=self.dtype, name="pos_conv"
        )(x)
        x = nn.LayerNorm(dtype=self.dtype, name="encoder_layer_norm")(x)

        n = self.layers if output_layer is None else min(output_layer, self.layers)
        for i in range(self.layers):
            if i >= n:
                break
            x = TransformerSentenceEncoderLayer(
                dim=self.dim, heads=self.heads, ffn_dim=self.ffn_dim,
                dtype=self.dtype, name=f"layer_{i}",
            )(x, mask=mask)
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
    conv_feature_layers: Optional[Sequence[Tuple[int, int, int]]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = HubertEncoder(
            dim=self.dim, layers=self.layers, heads=self.heads,
            ffn_dim=self.ffn_dim,
            conv_feature_layers=self.conv_feature_layers,
            dtype=self.dtype, name="w2v_model",
        )
        self.proj = nn.Dense(self.vocab_size, dtype=self.dtype, name="proj")
        self.dropout = nn.Dropout(self.final_dropout)

    def __call__(self, src, src_lengths, deterministic: bool = True):
        wav = src[..., 0] if src.ndim == 3 else src
        out_lengths = frame_lengths(src_lengths, self.conv_feature_layers)
        n_frames = frames_for_samples(wav.shape[1], self.conv_feature_layers)
        mask = jnp.arange(n_frames)[None, :] < out_lengths[:, None]
        x = self.encoder(wav, mask=mask)
        x = self.dropout(x, deterministic=deterministic)
        logits = self.proj(x)
        return dict(logits=logits, logit_lengths=out_lengths, mask=mask)


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
            conv_feature_layers=_parse_conv_spec(
                cfg.get("conv_feature_layers")),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("hubert_ctc", "hubert_ctc")
def hubert_ctc_arch(cfg):
    cfg.setdefault("encoder_embed_dim", 768)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 12)
    cfg.setdefault("encoder_ffn_embed_dim", 3072)
