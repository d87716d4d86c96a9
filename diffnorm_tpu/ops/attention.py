"""Attention core shared by every model in the framework.

Default path is a fused-by-XLA einsum attention in fp32 accumulation — on TPU
XLA fuses scale/mask/softmax into the two MXU matmuls, which is near
speed-of-light for the short sequences this stack sees (<=1024 frames).
A Pallas flash-attention kernel (ops/pallas_attention.py) is used
automatically for long sequences where the O(T^2) score materialization
starts to hurt HBM.

Replaces reference Attend (fairseq/models/text_to_speech/latent_module.py:221-343)
and fairseq MultiheadAttention.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Opt-in threshold for the Pallas flash kernel. Measured on v5e (bf16,
# D=64): XLA's fused attention is as fast at T=2048 and ~1.7x faster at
# T=4096 than the current kernel (which re-streams K/V per q-block), so the
# default keeps XLA; set DIFFNORM_FLASH_ATTENTION=1 to route long sequences
# through Pallas (useful once the kernel gains K/V-resident pipelining).
import os

_PALLAS_MIN_LEN = 2048
_USE_PALLAS = bool(int(os.environ.get("DIFFNORM_FLASH_ATTENTION", "0")))


def masked_attention(
    q,
    k,
    v,
    mask=None,
    bias=None,
    dropout: float = 0.0,
    dropout_rng=None,
    causal: bool = False,
):
    """Scaled dot-product attention with key-padding mask.

    q: [B, H, Tq, D], k/v: [B, H, Tk, D]
    mask: optional [B, Tk] bool, True = valid key position
    bias: optional [B, H, Tq, Tk] additive bias (e.g. relative positions)
    Returns [B, H, Tq, D] in q.dtype.
    """
    orig_dtype = q.dtype
    # long sequences: route to the Pallas flash kernel (no score matrix in
    # HBM); only for the plain masked case — bias/causal/dropout stay on the
    # fused-XLA path
    if (
        _USE_PALLAS
        and k.shape[-2] >= _PALLAS_MIN_LEN
        and bias is None
        and not causal
        and (dropout == 0.0 or dropout_rng is None)
        and jax.devices()[0].platform == "tpu"
    ):
        from diffnorm_tpu.ops.pallas_attention import flash_attention

        return flash_attention(q, k, v, mask=mask)

    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    sim = sim * scale
    if bias is not None:
        sim = sim + bias.astype(jnp.float32)
    neg = jnp.finfo(jnp.float32).min
    if mask is not None:
        sim = jnp.where(mask[:, None, None, :], sim, neg)
    if causal:
        tq, tk = sim.shape[-2], sim.shape[-1]
        cm = jnp.tril(jnp.ones((tq, tk), dtype=bool), k=tk - tq)
        sim = jnp.where(cm[None, None], sim, neg)
    attn = jax.nn.softmax(sim, axis=-1)
    if dropout > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout, attn.shape)
        attn = jnp.where(keep, attn / (1.0 - dropout), 0.0)
    # probs @ v: in bf16 the MXU runs bf16 x bf16 -> f32 at full rate while
    # f32 x f32 is several times slower; softmax stays f32 above, and
    # rounding the probabilities to bf16 for the contraction is the standard
    # flash-attention numeric (measured ~1e-3 relative error).
    if v.dtype == jnp.bfloat16:
        attn = attn.astype(jnp.bfloat16)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", attn, v if v.dtype == jnp.bfloat16
        else v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return out.astype(orig_dtype)
