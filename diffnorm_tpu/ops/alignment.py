"""Monotonic-attention expected alignment (MMA / simultaneous MT).

Reference: `examples/operators/alignment_train_cpu.cpp` (the C++ op behind
`expected_alignment_from_p_choose`,
`examples/simultaneous_translation/utils/monotonic_attention.py:12-59`;
arXiv 1704.00784): given stepwise selection probabilities p_choose
[B, T_tgt, T_src], compute the expected alignment

    alpha_i = p_i * cumprod(1 - p_i) * cumsum(alpha_{i-1} / clamp(cumprod))

row by row over the target axis, with alpha_{-1} = [1, 0, ...], the
exclusive cumprod clamped to [eps, 1] inside the division, and every
stored alpha clipped to [0, 1].

Two implementations with identical semantics (pinned against the COMPILED
real reference op in tests/test_reference_parity.py):

* `expected_alignment_from_p_choose` — jnp, jit-able: the target-axis
  recurrence is a `lax.scan`, everything per-row is vectorized cumsum /
  cumprod on the VPU. This is the TPU training path (the recurrence is
  sequential in T_tgt only, like the reference).
* `expected_alignment_host` — numpy + the csrc `alignment_train` C ABI
  (host-side parity twin of the reference's CPU binding).
"""

from __future__ import annotations

import ctypes
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _exclusive_cumprod_1mp(p):
    """cumprod(1 - p) in exclusive mode along the last axis: [1, (1-p0),
    (1-p0)(1-p1), ...] (reference exclusiveCumprod)."""
    one_mp = 1.0 - p
    inc = jnp.cumprod(one_mp, axis=-1)
    return jnp.concatenate(
        [jnp.ones_like(inc[..., :1]), inc[..., :-1]], axis=-1)


def expected_alignment_from_p_choose(
    p_choose: jnp.ndarray,
    padding_mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """p_choose [B, T_tgt, T_src] -> alpha [B, T_tgt, T_src] (jit-able).

    padding_mask [B, T_src] True = PAD zeroes the source column first,
    like the reference wrapper (monotonic_attention.py:42-43).
    """
    dtype = p_choose.dtype
    p = p_choose.astype(jnp.float32)
    if padding_mask is not None:
        p = jnp.where(padding_mask[:, None, :], 0.0, p)
    cumprod_1mp = _exclusive_cumprod_1mp(p)
    cumprod_clamp = jnp.clip(cumprod_1mp, eps, 1.0)

    b, _, src_len = p.shape
    alpha0 = jnp.zeros((b, src_len), jnp.float32).at[:, 0].set(1.0)

    def step(alpha_prev, row):
        p_row, cp_row, cl_row = row
        scan = jnp.cumsum(alpha_prev / cl_row, axis=-1)
        out = jnp.clip(scan * p_row * cp_row, 0.0, 1.0)
        return out, out

    # scan over the target axis (time-major rows)
    rows = (jnp.swapaxes(p, 0, 1), jnp.swapaxes(cumprod_1mp, 0, 1),
            jnp.swapaxes(cumprod_clamp, 0, 1))
    _, alpha = jax.lax.scan(step, alpha0, rows)
    return jnp.swapaxes(alpha, 0, 1).astype(dtype)


def expected_alignment_host(p_choose: np.ndarray,
                            eps: float = 1e-6) -> np.ndarray:
    """Host-side twin (csrc C ABI with a numpy fallback)."""
    from diffnorm_tpu.data.batching import _load_native

    p = np.ascontiguousarray(p_choose, np.float32)
    b, tgt, src = p.shape
    alpha = np.zeros_like(p)
    lib = _load_native()
    if lib and hasattr(lib, "alignment_train"):
        lib.alignment_train.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_float,
        ]
        lib.alignment_train(
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b, tgt, src, eps,
        )
        return alpha
    one_mp = 1.0 - p
    cumprod = np.concatenate(
        [np.ones_like(p[..., :1]), np.cumprod(one_mp, axis=-1)[..., :-1]],
        axis=-1)
    clamp = np.clip(cumprod, eps, 1.0)
    prev = np.zeros((b, src), np.float32)
    prev[:, 0] = 1.0
    for t in range(tgt):
        scan = np.cumsum(prev / clamp[:, t], axis=-1)
        alpha[:, t] = np.clip(scan * p[:, t] * cumprod[:, t], 0.0, 1.0)
        prev = alpha[:, t]
    return alpha
