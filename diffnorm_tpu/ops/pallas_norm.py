"""Pallas fused RMSNorm(+FiLM) kernel.

The DDIM denoiser spends ~25% of its step in XLA's norm fusions
(PERFORMANCE.md: 25 norms x ~0.15 ms at [64,128,512], ~7x the HBM roofline).
This kernel reads x once, computes the row L2 stats in-register, applies the
per-batch FiLM gamma/beta, and writes once — one [T, C] tile per batch row.

Enabled in models/layers.RMSNorm via DIFFNORM_PALLAS_NORM=1 (film path only).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _norm_film_kernel(x_ref, gb_ref, o_ref, *, scale, eps):
    x = x_ref[:].astype(jnp.float32)  # [T, C]
    c = x.shape[-1]
    ss = jnp.sum(x * x, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(jnp.maximum(ss, eps * eps)) * scale
    y = x * inv
    gb = gb_ref[0, :].astype(jnp.float32)  # [2C] (this batch row's film)
    gamma = gb[:c]
    beta = gb[c:]
    o_ref[:] = (y * gamma[None, :] + beta[None, :]).astype(o_ref.dtype)


def rms_norm_film(x, film, eps: float = 1e-12, interpret: bool = False):
    """x: [B, T, C]; film: [B, 2C] (gamma ++ beta). Returns x.dtype.
    out = l2norm(x) * sqrt(C) * gamma + beta (RMSNorm FiLM parity)."""
    b, t, c = x.shape
    scale = math.sqrt(c)
    # tile the per-batch film to a sublane-aligned [B, 8, 2C] so each grid
    # cell gets a well-shaped block (dynamic row reads crash the Mosaic
    # remote compiler in this image)
    film8 = jnp.broadcast_to(film[:, None, :], (b, 8, 2 * c))
    return pl.pallas_call(
        functools.partial(_norm_film_kernel, scale=scale, eps=eps),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 8, 2 * c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(x, film8)
