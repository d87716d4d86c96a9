"""Pallas TPU flash attention with key-padding masks.

Online-softmax tiled attention: Q blocks stream over K/V blocks entirely in
VMEM, never materializing the [Tq, Tk] score matrix in HBM. Replaces the
reference's torch SDPA/flash path (latent_module.py:264-297) for long
sequences; ops/attention.py routes here when Tk >= _PALLAS_MIN_LEN.

Layout: q/k/v [B, H, T, D] with D padded to 128 lanes by the caller
(dims here are 64/96/128). f32 accumulation, bf16-friendly inputs.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e30


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale, block_k):
    """One (batch*head, q-block) program: online softmax over k blocks.

    q_ref: [BQ, D]; k_ref/v_ref: [Tk, D]; mask_ref: [1, Tk] (1=valid);
    o_ref: [BQ, D].
    """
    bq, d = q_ref.shape
    tk = k_ref.shape[0]
    q = q_ref[:].astype(jnp.float32) * scale

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    def body(i, carry):
        m_prev, l_prev, acc = carry
        k_blk = k_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        valid = mask_ref[0, pl.ds(i * block_k, block_k)] > 0
        s = jnp.where(valid[None, :], s, NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc = acc * alpha + jax.lax.dot(
            p, v_blk, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc

    m, l, acc = jax.lax.fori_loop(0, tk // block_k, body, (m0, l0, acc0))
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _attn_kernel_wide(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    """Single-shot variant: the whole [BQ, Tk] score tile lives in VMEM
    (fine up to Tk ~ 8k at BQ=256) — two large MXU calls instead of a
    fori_loop of small ones."""
    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    valid = mask_ref[0, :] > 0
    s = jnp.where(valid[None, :], s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot(p, v, preferred_element_type=jnp.float32)
    o_ref[:] = (o / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _round_up(x, m):
    return (x + m - 1) // m * m


def flash_attention(q, k, v, mask=None, block_q: int = 256,
                    block_k: int = 512, interpret: bool = False,
                    wide: bool = True):
    """q: [B, H, Tq, D]; k/v: [B, H, Tk, D]; mask: [B, Tk] bool (True=valid).
    Returns [B, H, Tq, D] in q.dtype."""
    b, h, tq, d = q.shape
    tk = k.shape[2]
    scale = 1.0 / math.sqrt(d)

    # pad to tile boundaries
    d_pad = _round_up(d, 128)
    tq_pad = _round_up(tq, block_q)
    tk_pad = _round_up(tk, block_k)

    def pad_to(x, t_pad):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, t_pad - x.shape[2]), (0, d_pad - d))
        )

    qp, kp, vp = pad_to(q, tq_pad), pad_to(k, tk_pad), pad_to(v, tk_pad)
    if mask is None:
        mask = jnp.ones((b, tk), bool)
    mask_i = jnp.pad(mask.astype(jnp.int32), ((0, 0), (0, tk_pad - tk)))

    qf = qp.reshape(b * h, tq_pad, d_pad)
    kf = kp.reshape(b * h, tk_pad, d_pad)
    vf = vp.reshape(b * h, tk_pad, d_pad)
    mf = jnp.repeat(mask_i, h, axis=0)[:, None, :]  # [B*H, 1, Tk]

    grid = (b * h, tq_pad // block_q)
    kernel = (
        functools.partial(_attn_kernel_wide, scale=scale)
        if wide and tk_pad <= 8192
        else functools.partial(_attn_kernel, scale=scale, block_k=block_k)
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tk_pad, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, tk_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(qf, kf, vf, mf)
    return out.reshape(b, h, tq_pad, d_pad)[:, :, :tq, :d]
