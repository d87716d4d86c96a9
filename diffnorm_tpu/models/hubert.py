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
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav, output_layer: Optional[int] = None, mask=None):
        """wav: [B, T] float32 (16 kHz). Returns [B, frames, dim] features
        from `output_layer` (1-based; None = final)."""
        feats = ConvFeatureExtractor(dtype=self.dtype, name="feature_extractor")(wav)
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


def frames_for_samples(n_samples: int) -> int:
    """Output frame count of the conv extractor for a waveform length."""
    n = n_samples
    for _, k, s in CONV_LAYERS:
        n = (n - k) // s + 1
    return n
