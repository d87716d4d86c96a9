"""WaveNet stacks used by the speech VAE and the diffusion denoiser.

Topology parity with reference latent_module.py:491-617/1003-1032
(lucidrains naturalspeech2-style): there are `layers` *parallel chains*, chain
j using dilation 2**j in every stack; chains only interact at the end where
the last stack's skip convolutions are summed. Each block is a causal dilated
conv with gated tanh*sigmoid activation, FiLM time conditioning, and a 1x1
causal residual conv.

All tensors are batch-first [B, T, C]; convs run as lax.conv_general_dilated
NWC graphs which XLA tiles directly onto the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.models.layers import CausalConv1d


class WavenetResBlock(nn.Module):
    dim: int
    dilation: int
    kernel_size: int = 3
    skip_conv: bool = False
    cond_dim: Optional[int] = None  # dim of time-condition vector, or None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None):
        res = CausalConv1d(self.dim, 1, dtype=self.dtype, name="res_conv")(x)
        h = CausalConv1d(
            self.dim, self.kernel_size, dilation=self.dilation,
            dtype=self.dtype, name="conv",
        )(x)
        if self.cond_dim is not None:
            assert t is not None
            tc = nn.Dense(self.dim * 2, dtype=self.dtype, name="to_time_cond")(t)
            gamma, beta = jnp.split(tc[:, None, :], 2, axis=-1)  # [B, 1, C] each
            h = h * gamma + beta
        h = jnp.tanh(h) * nn.sigmoid(h)
        h = h + res
        skip = None
        if self.skip_conv:
            skip = CausalConv1d(self.dim, 1, dtype=self.dtype, name="skip_conv")(h)
        return h, skip


class WavenetStack(nn.Module):
    dim: int
    layers: int
    kernel_size: int = 3
    has_skip: bool = False
    cond_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xs, t=None):
        """xs: a single [B, T, C] array (broadcast to every chain) or a list of
        per-chain arrays. Returns list of residuals, or list of skips if
        has_skip."""
        if not isinstance(xs, (list, tuple)):
            xs = [xs] * self.layers
        outs, skips = [], []
        for j in range(self.layers):
            h, skip = WavenetResBlock(
                dim=self.dim,
                dilation=2 ** j,
                kernel_size=self.kernel_size,
                skip_conv=self.has_skip,
                cond_dim=self.cond_dim,
                dtype=self.dtype,
                name=f"block_{j}",
            )(xs[j], t)
            outs.append(h)
            skips.append(skip)
        return skips if self.has_skip else outs


class Wavenet(nn.Module):
    """Full WaveNet: init causal conv -> stacks (last with skip) -> sum ->
    1x1 causal out conv. `in_dim` may differ from `dim` (the encoder variant,
    reference WavenetEncoder latent_module.py:1003-1032)."""

    dim: int
    stacks: int
    layers: int
    init_conv_kernel: int = 3
    cond_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, t=None):
        x = CausalConv1d(
            self.dim, self.init_conv_kernel, dtype=self.dtype, name="init_conv"
        )(x)
        h = x
        for s in range(self.stacks):
            is_last = s == self.stacks - 1
            h = WavenetStack(
                dim=self.dim,
                layers=self.layers,
                has_skip=is_last,
                cond_dim=self.cond_dim,
                dtype=self.dtype,
                name=f"stack_{s}",
            )(h, t)
        out = sum(h)  # sum of per-chain skips
        return CausalConv1d(self.dim, 1, dtype=self.dtype, name="final_conv")(out)
