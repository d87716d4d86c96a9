"""Lightweight and dynamic convolutions (Pay-Less-Attention).

Capability parity with the reference's CUDA kernels
(fairseq/modules/lightconv_layer/*, dynamicconv_layer/* — fused
softmax-normalized depthwise convolutions): here the softmax over the kernel
axis and the depthwise convolution lower to K shifted multiply-adds that XLA
fuses into a handful of VPU kernels — no [B, T, C, K] intermediate, no HBM
roundtrip for the normalized weights.

* lightconv: weights [H, K] shared per head across C/H channels
* dynamicconv: weights predicted per position, [B, T, H, K]
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _shift(x, offset: int):
    """x: [B, T, C] shifted so out[t] = x[t + offset], zero-padded."""
    t = x.shape[1]
    if offset == 0:
        return x
    if offset > 0:
        return jnp.pad(x[:, offset:], ((0, 0), (0, offset), (0, 0)))
    return jnp.pad(x[:, :offset], ((0, 0), (-offset, 0), (0, 0)))


def lightconv(x, weights, padding: str = "causal",
              softmax_normalize: bool = True):
    """x: [B, T, C]; weights: [H, K] -> [B, T, C].

    causal: out[t] = sum_k w[k] * x[t - (K-1) + k]
    same:   centered window (pad K//2 left-context like torch padding=K//2).
    """
    b, t, c = x.shape
    h, k = weights.shape
    assert c % h == 0
    w = jax.nn.softmax(weights.astype(jnp.float32), axis=-1) if softmax_normalize \
        else weights.astype(jnp.float32)
    w = jnp.repeat(w, c // h, axis=0)  # [C, K]
    base = -(k - 1) if padding == "causal" else -(k // 2)
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for i in range(k):
        out = out + _shift(x.astype(jnp.float32), base + i) * w[None, None, :, i]
    return out.astype(x.dtype)


def dynamicconv(x, weights, padding: str = "causal",
                softmax_normalize: bool = True):
    """x: [B, T, C]; weights: [B, T, H, K] -> [B, T, C]."""
    b, t, c = x.shape
    _, _, h, k = weights.shape
    assert c % h == 0
    w = jax.nn.softmax(weights.astype(jnp.float32), axis=-1) if softmax_normalize \
        else weights.astype(jnp.float32)
    w = jnp.repeat(w, c // h, axis=2)  # [B, T, C, K]
    base = -(k - 1) if padding == "causal" else -(k // 2)
    out = jnp.zeros_like(x, dtype=jnp.float32)
    for i in range(k):
        out = out + _shift(x.astype(jnp.float32), base + i) * w[..., i]
    return out.astype(x.dtype)
