"""wav2vec 2.0 contrastive pretraining (reference
fairseq/models/wav2vec/wav2vec2.py Wav2Vec2Model:580-781 + the gumbel
quantizer fairseq/modules/gumbel_vector_quantizer.py; recipe
examples/wav2vec/config/pretraining/wav2vec2_base_librispeech.yaml).

TPU-first redesign — everything static-shaped and gather-light:

* The reference draws the span mask + 100 negatives per masked frame ON
  DEVICE and boolean-gathers masked frames into data-dependent [B, M, D]
  tensors (its own tpu-comment at wav2vec2.py:663 admits the recompile
  problem). Here the task's `prepare_batch` draws masks (the bit-exact
  `utils.masking.compute_mask_indices` port, require_same_masks=True) and
  negative indices host-side and ships a FIXED-budget `masked_pos
  [B, M_pad]` + validity, so the jitted step never retraces: gathers are
  static `take_along_axis`, the contrastive cosines are one batched MXU
  matmul [B, M_pad, 1+N].
* The Gumbel quantizer's perplexities are masked means over the validity
  (exactly the reference's batch mean when every slot is valid).
* Omitted generality, all off in every released recipe: input_quantizer,
  negatives_from_everywhere, cross_sample_negatives, codebook_negatives,
  target_glu, conformer layer_type, crop_seq_to_multiple>1.

The encoder backbone is shared with HuBERT (models/hubert.py
HubertEncoder — same wav2vec2.py TransformerEncoder semantics).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.models.hubert import (
    HubertEncoder,
    _parse_conv_spec,
    frame_lengths,
    frames_for_samples,
)
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model


class GumbelVectorQuantizer(nn.Module):
    """fairseq/modules/gumbel_vector_quantizer.py with the released-recipe
    shape (weight_proj_depth=1, time_first=True). combine_groups shares one
    codebook across groups."""

    dim: int
    num_vars: int = 320
    groups: int = 2
    vq_dim: int = 256
    combine_groups: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temp, valid=None, train: bool = False,
                 gumbel_rng=None):
        """x: [B, M, C]; temp: scalar gumbel temperature; valid: optional
        bool [B, M] weighting the perplexity means. Returns dict with the
        quantized `x` [B, M, vq_dim], prob/code perplexities and num_vars
        (reference forward :146-205)."""
        b, m, _ = x.shape
        var_dim = self.vq_dim // self.groups
        num_groups = 1 if self.combine_groups else self.groups
        # reference inits: vars ~ U[0,1); weight_proj ~ N(0,1), zero bias
        codebook = self.param(
            "vars", nn.initializers.uniform(scale=1.0),
            (1, num_groups * self.num_vars, var_dim))
        logits = nn.Dense(
            self.groups * self.num_vars, dtype=self.dtype,
            kernel_init=nn.initializers.normal(stddev=1.0),
            name="weight_proj")(x)
        logits = logits.reshape(b, m, self.groups, self.num_vars)

        hard_idx = jnp.argmax(logits, axis=-1)
        hard_x = jax.nn.one_hot(hard_idx, self.num_vars, dtype=jnp.float32)
        if valid is None:
            w = jnp.ones((b, m, 1, 1), jnp.float32)
        else:
            w = valid[:, :, None, None].astype(jnp.float32)
        denom = jnp.maximum(jnp.sum(w), 1.0)
        # perplexity of the hard code distribution and of the mean softmax
        hard_probs = jnp.sum(hard_x * w, axis=(0, 1)) / denom
        code_ppl = jnp.sum(jnp.exp(
            -jnp.sum(hard_probs * jnp.log(hard_probs + 1e-7), axis=-1)))
        avg_probs = jnp.sum(
            jax.nn.softmax(logits.astype(jnp.float32), axis=-1) * w,
            axis=(0, 1)) / denom
        prob_ppl = jnp.sum(jnp.exp(
            -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-7), axis=-1)))

        if train:
            # straight-through hard gumbel-softmax (torch F.gumbel_softmax
            # hard=True): backward flows through the soft sample
            u = jax.random.uniform(
                gumbel_rng, logits.shape, jnp.float32,
                minval=jnp.finfo(jnp.float32).tiny, maxval=1.0)
            g = -jnp.log(-jnp.log(u))
            soft = jax.nn.softmax(
                (logits.astype(jnp.float32) + g) / temp, axis=-1)
            hard = jax.nn.one_hot(
                jnp.argmax(soft, axis=-1), self.num_vars, dtype=jnp.float32)
            sel = hard + soft - jax.lax.stop_gradient(soft)
        else:
            sel = hard_x

        cb = codebook.reshape(num_groups, self.num_vars, var_dim)
        if self.combine_groups:
            cb = jnp.broadcast_to(cb, (self.groups, self.num_vars, var_dim))
        q = jnp.einsum("bmgv,gvd->bmgd", sel, cb.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        q = q.reshape(b, m, self.vq_dim)
        return {
            "x": q.astype(x.dtype),
            "targets": hard_idx,
            "num_vars": self.num_vars * self.groups,
            "code_perplexity": code_ppl,
            "prob_perplexity": prob_ppl,
        }


def _cosine(a, b, eps: float = 1e-8):
    """torch.cosine_similarity over the last axis (clamped denominator)."""
    num = jnp.sum(a * b, axis=-1)
    den = jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1)
    return num / jnp.maximum(den, eps)


class Wav2Vec2PretrainModule(nn.Module):
    """Contrastive forward (wav2vec2.py:580-781, quantize_targets=True):
    encoder output at masked frames vs the gumbel-quantized layer-normed
    features, against N same-utterance masked-frame negatives."""

    dim: int = 768
    layers: int = 12
    heads: int = 12
    ffn_dim: int = 3072
    final_dim: int = 256
    latent_vars: int = 320
    latent_groups: int = 2
    latent_dim: int = 0  # 0 -> final_dim * latent_groups // groups rule:
    # reference: vq_dim = latent_dim if > 0 else final_dim
    logit_temp: float = 0.1
    feature_grad_mult: float = 0.1
    dropout_input: float = 0.1
    dropout_features: float = 0.1
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
        vq_dim = self.latent_dim if self.latent_dim > 0 else self.final_dim
        self.quantizer = GumbelVectorQuantizer(
            dim=0, num_vars=self.latent_vars, groups=self.latent_groups,
            vq_dim=vq_dim, dtype=self.dtype, name="quantizer")
        self.project_q = nn.Dense(
            self.final_dim, dtype=self.dtype, name="project_q")
        self.final_proj = nn.Dense(
            self.final_dim, dtype=self.dtype, name="final_proj")
        self.mask_emb = self.param(
            "mask_emb", nn.initializers.uniform(scale=1.0), (self.dim,))
        self.dropout_features_mod = nn.Dropout(self.dropout_features)

    def __call__(self, src, src_lengths, mask_indices, masked_pos,
                 masked_valid, neg_idxs, temp=2.0,
                 deterministic: bool = True):
        """src: [B, T(,1)] 16 kHz waveform. mask_indices: [B, F] bool span
        mask. masked_pos: [B, M] int32 frame indices of the masked slots
        (row-major, padded); masked_valid: [B, M] bool. neg_idxs:
        [B, M, N] int32 indices INTO the masked axis (the reference's
        same-utterance negative draw, wav2vec2.py sample_negatives
        :684-744, moved host-side). temp: gumbel temperature (annealed by
        the task via set_num_updates). Returns contrastive logits
        [B, M, 1+N] (true-quantized first, duplicates -inf)."""
        wav = src[..., 0] if src.ndim == 3 else src
        n_frames = frames_for_samples(wav.shape[1], self.conv_feature_layers)
        out_lengths = frame_lengths(src_lengths, self.conv_feature_layers)
        valid = jnp.arange(n_frames)[None, :] < out_lengths[:, None]
        x, raw_features, normed = self.encoder(
            wav, mask=valid, deterministic=deterministic,
            mask_indices=mask_indices, mask_emb=self.mask_emb,
            return_normed=True,
        )
        features_pen = jnp.mean(jnp.square(raw_features.astype(jnp.float32)))

        # contrastive targets: layer-normed conv features at masked slots
        y_src = jnp.take_along_axis(normed, masked_pos[:, :, None], axis=1)
        y_src = self.dropout_features_mod(y_src, deterministic=deterministic)
        gumbel_rng = None
        if not deterministic:
            gumbel_rng = self.make_rng("dropout")
        q = self.quantizer(y_src, temp, valid=masked_valid,
                           train=not deterministic, gumbel_rng=gumbel_rng)
        y = self.project_q(q["x"]).astype(jnp.float32)  # [B, M, Df]

        x_m = jnp.take_along_axis(x, masked_pos[:, :, None], axis=1)
        x_m = self.final_proj(x_m).astype(jnp.float32)  # [B, M, Df]

        b, m, df = y.shape
        n = neg_idxs.shape[-1]
        negs = jnp.take_along_axis(
            y, neg_idxs.reshape(b, m * n)[:, :, None], axis=1
        ).reshape(b, m, n, df)
        # reference compute_preds :744-762: negatives identical to the
        # positive (same codebook entry) are removed from the softmax
        neg_is_pos = jnp.all(y[:, :, None, :] == negs, axis=-1)
        pos_sim = _cosine(x_m, y)[:, :, None]
        neg_sim = _cosine(x_m[:, :, None, :], negs)
        neg_sim = jnp.where(neg_is_pos, -jnp.inf, neg_sim)
        logits = jnp.concatenate([pos_sim, neg_sim], axis=2) / self.logit_temp
        return {
            "logits": logits,
            "features_pen": features_pen,
            "prob_perplexity": q["prob_perplexity"],
            "code_perplexity": q["code_perplexity"],
            "num_vars": q["num_vars"],
            "targets": q["targets"],
            "temp": temp,
            "masked_valid": masked_valid,
            "mask": valid,
        }


@register_model("wav2vec2")
class Wav2Vec2PretrainModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg, task=None) -> "Wav2Vec2PretrainModel":
        module = Wav2Vec2PretrainModule(
            dim=cfg.get("encoder_embed_dim", 768),
            layers=cfg.get("encoder_layers", 12),
            heads=cfg.get("encoder_attention_heads", 12),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 3072),
            final_dim=cfg.get("final_dim", 256),
            latent_vars=cfg.get("latent_vars", 320),
            latent_groups=cfg.get("latent_groups", 2),
            latent_dim=cfg.get("latent_dim", 0),
            logit_temp=cfg.get("logit_temp", 0.1),
            feature_grad_mult=cfg.get("feature_grad_mult", 0.1),
            dropout_input=cfg.get("dropout_input", 0.1),
            dropout_features=cfg.get("dropout_features", 0.1),
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


@register_architecture("wav2vec2", "wav2vec2")
@register_architecture("wav2vec2", "wav2vec2_base")
def wav2vec2_base_arch(cfg):
    cfg.setdefault("encoder_embed_dim", 768)
    cfg.setdefault("encoder_layers", 12)
    cfg.setdefault("encoder_attention_heads", 12)
    cfg.setdefault("encoder_ffn_embed_dim", 3072)
    cfg.setdefault("final_dim", 256)


@register_architecture("wav2vec2", "wav2vec2_large")
def wav2vec2_large_arch(cfg):
    """wav2vec2_large_librivox.yaml: pre-norm 24L/1024d, layer_norm
    extractor with conv biases."""
    cfg.setdefault("encoder_embed_dim", 1024)
    cfg.setdefault("encoder_layers", 24)
    cfg.setdefault("encoder_attention_heads", 16)
    cfg.setdefault("encoder_ffn_embed_dim", 4096)
    cfg.setdefault("final_dim", 768)
    cfg.setdefault("latent_temp", (2.0, 0.1, 0.999995))
    cfg.setdefault("extractor_mode", "layer_norm")
    cfg.setdefault("conv_bias", True)
    cfg.setdefault("layer_norm_first", True)
