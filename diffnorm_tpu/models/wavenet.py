"""WaveNet stacks used by the speech VAE and the diffusion denoiser.

Topology parity with reference latent_module.py:491-617/1003-1032
(lucidrains naturalspeech2-style): there are `layers` *parallel chains*, chain
j using dilation 2**j in every stack; chains only interact at the end where
the last stack's skip convolutions are summed. Each block is a causal dilated
conv with gated tanh*sigmoid activation, FiLM time conditioning, and a 1x1
causal residual conv.

All tensors are batch-first [B, T, C]; convs run as shifted MXU matmuls
(see layers.CausalConv1d). The per-block FiLM projections
(`to_time_cond`: [dim_time, 2*dim] each — the bulk of the denoiser's
parameters) support precomputation via `precompute_film`, so sampling scans
read those weights from HBM once instead of once per diffusion step
(PERFORMANCE.md).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.models.layers import CausalConv1d


class WavenetResBlock(nn.Module):
    dim: int
    dilation: int
    kernel_size: int = 3
    skip_conv: bool = False
    cond_dim: Optional[int] = None  # dim of time-condition vector, or None
    quant: bool = False  # int8 W8A8 convs (inference only)
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.res_conv = CausalConv1d(self.dim, 1, quant=self.quant,
                                     dtype=self.dtype, name="res_conv")
        self.conv = CausalConv1d(
            self.dim, self.kernel_size, dilation=self.dilation,
            quant=self.quant, dtype=self.dtype, name="conv",
        )
        if self.cond_dim is not None:
            self.to_time_cond = nn.Dense(self.dim * 2, dtype=self.dtype,
                                         name="to_time_cond")
        if self.skip_conv:
            self.skip = CausalConv1d(self.dim, 1, quant=self.quant,
                                     dtype=self.dtype, name="skip_conv")

    def film(self, t):
        return self.to_time_cond(t)

    def __call__(self, x, t=None, film=None):
        res = self.res_conv(x)
        h = self.conv(x)
        if self.cond_dim is not None:
            tc = film if film is not None else self.to_time_cond(t)
            gamma, beta = jnp.split(tc[:, None, :], 2, axis=-1)  # [B, 1, C]
            h = h * gamma + beta
        h = jnp.tanh(h) * nn.sigmoid(h)
        h = h + res
        skip = None
        if self.skip_conv:
            skip = self.skip(h)
        return h, skip


class WavenetStack(nn.Module):
    dim: int
    layers: int
    kernel_size: int = 3
    has_skip: bool = False
    cond_dim: Optional[int] = None
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.blocks = [
            WavenetResBlock(
                dim=self.dim,
                dilation=2 ** j,
                kernel_size=self.kernel_size,
                skip_conv=self.has_skip,
                cond_dim=self.cond_dim,
                quant=self.quant,
                dtype=self.dtype,
                name=f"block_{j}",
            )
            for j in range(self.layers)
        ]

    def precompute_film(self, t):
        return [b.film(t) for b in self.blocks]

    def __call__(self, xs, t=None, film=None):
        """xs: a single [B, T, C] array (broadcast to every chain) or a list of
        per-chain arrays. Returns list of residuals, or list of skips if
        has_skip."""
        if not isinstance(xs, (list, tuple)):
            xs = [xs] * self.layers
        outs, skips = [], []
        for j, block in enumerate(self.blocks):
            h, skip = block(xs[j], t, film=film[j] if film else None)
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
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.init_conv = CausalConv1d(
            self.dim, self.init_conv_kernel, dtype=self.dtype, name="init_conv"
        )
        self.wstacks = [
            WavenetStack(
                dim=self.dim,
                layers=self.layers,
                has_skip=(s == self.stacks - 1),
                cond_dim=self.cond_dim,
                quant=self.quant,
                dtype=self.dtype,
                name=f"stack_{s}",
            )
            for s in range(self.stacks)
        ]
        self.final_conv = CausalConv1d(self.dim, 1, dtype=self.dtype,
                                       name="final_conv")

    def precompute_film(self, t):
        """All FiLM projections for condition t [..., cond_dim] — one HBM
        read of every to_time_cond weight, reusable across scan steps."""
        return [s.precompute_film(t) for s in self.wstacks]

    def __call__(self, x, t=None, film=None):
        x = self.init_conv(x)
        if (os.environ.get("DIFFNORM_PALLAS_WAVENET") == "1"
                and not self.is_initializing()):
            out = self._chains_pallas(x, t, film)
        else:
            h = x
            for s, stack in enumerate(self.wstacks):
                h = stack(h, t, film=film[s] if film else None)
            out = sum(h)  # sum of per-chain skips
        return self.final_conv(out)

    def _chains_pallas(self, x, t=None, film=None,
                       interpret: bool = False):
        """Chain-fused pallas path (DIFFNORM_PALLAS_WAVENET=1): per chain,
        all stacks run in one VMEM-resident kernel; parameters are read
        straight from the per-block subtree so checkpoints are unchanged
        (ops/pallas_wavenet.py)."""
        from diffnorm_tpu.ops.pallas_wavenet import wavenet_chain

        p = self.variables["params"]
        b = x.shape[0]
        c = self.dim
        n_stacks = self.stacks
        dt = self.dtype
        if self.cond_dim is not None and film is None:
            film = self.precompute_film(t)

        skips = []
        for l in range(self.layers):
            blocks = [p[f"stack_{s}"][f"block_{l}"] for s in range(n_stacks)]
            w_conv = jnp.stack([bl["conv"]["kernel"] for bl in blocks])
            w_res = jnp.stack([bl["res_conv"]["kernel"][0] for bl in blocks])
            w_skip = blocks[-1]["skip_conv"]["kernel"][0]
            biases = jnp.zeros((n_stacks, 2 * c), jnp.float32)
            biases = biases.at[:, :c].set(
                jnp.stack([bl["res_conv"]["bias"] for bl in blocks])
            )
            biases = biases.at[-1, c:].set(blocks[-1]["skip_conv"]["bias"])
            biases8 = jnp.broadcast_to(
                biases[:, None, :], (n_stacks, 8, 2 * c)
            ).astype(dt)

            b_conv = jnp.stack([bl["conv"]["bias"] for bl in blocks])  # [S,C]
            if self.cond_dim is not None:
                tc = jnp.stack([film[s][l] for s in range(n_stacks)], axis=1)
                gamma = tc[..., :c]
                beta = tc[..., c:] + b_conv[None]  # fold conv bias into FiLM
            else:
                gamma = jnp.ones((b, n_stacks, c), dt)
                beta = jnp.broadcast_to(b_conv[None], (b, n_stacks, c))
            gb = jnp.concatenate(
                [gamma.astype(dt), beta.astype(dt)], axis=-1
            )  # [B, S, 2C]
            film8 = jnp.broadcast_to(
                gb[:, :, None, :], (b, n_stacks, 8, 2 * c)
            )
            skips.append(wavenet_chain(
                x.astype(dt), w_conv.astype(dt), w_res.astype(dt),
                w_skip.astype(dt), biases8, film8, dilation=2 ** l,
                interpret=interpret,
            ))
        return sum(skips)