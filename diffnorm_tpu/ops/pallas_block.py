"""Fused transformer-layer Pallas kernel for the DDIM denoiser.

One kernel = one full ConditionableTransformer layer (adaptive RMSNorm ->
attention -> residual -> adaptive RMSNorm -> GEGLU causal-conv FF ->
residual) with the batch as the grid: each grid step holds one [T, C]
activation row in VMEM end-to-end, so the ~10 per-layer intermediate
tensors that the XLA path materializes in HBM never leave the chip.
Weights stay VMEM-resident across the whole batch grid (constant index
maps): attention projections in bf16 (~2 MB, 6% of layer FLOPs), the
FLOP-dominant feed-forward (GEGLU proj + full k=3 causal conv at
dim_inner, ~92% of layer FLOPs — PERFORMANCE.md component split) as int8
W8A8 with per-token activation scales, matching the numerics of the
ops/quant.py inference path (reference denoiser: latent_module.py:642-706,
:881-903).

Measured motivation: at int8 the [64, 128, 512] DDIM step is ~11 ms of
which only ~4.5 ms is MXU — the rest is HBM traffic of norm/elementwise/
quantize intermediates between ~165 near-roofline ops. Fusing the layer
keeps all of that in VMEM.

Mosaic-remote-compiler constraints honored here (learned in
ops/pallas_norm.py / ops/pallas_wavenet.py): no dynamic row reads from
VMEM refs; per-batch vectors tiled to sublane-aligned [B, 8, D] blocks;
broadcasts written as 1-D read + `[None, :]`; shifts as static slice +
concatenate (never jnp.roll).

Used by ConditionableTransformer when DIFFNORM_FUSED_BLOCK=1 (sampling
path only: film precomputed, deterministic, no cross-attention, int8 on).
Runs in interpreter mode off-TPU so tests exercise the identical code.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffnorm_tpu.ops.quant import quantize_weight


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quant_act(v):
    """Per-token symmetric int8: v f32 [T, D] -> (int8 [T, D], scale [T, 1])."""
    a = jnp.maximum(
        jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    q = jnp.round(v / a).astype(jnp.int8)
    return q, a


def _norm_film(v, gb, dim: int):
    """Adaptive RMSNorm (scale-free l2norm * sqrt(dim), then FiLM).

    v: [T, C] (any float dtype), gb: 1-D [2C] f32 (gamma ++ beta).
    Returns f32 [T, C]. Mirrors models/layers.py:RMSNorm with cond_dim set
    (reference latent_module.py:620-639)."""
    vf = v.astype(jnp.float32)
    sq = jnp.sum(vf * vf, axis=-1, keepdims=True)
    n = vf * (dim ** 0.5 / jnp.maximum(jnp.sqrt(sq), 1e-12))
    return n * gb[:dim][None, :] + gb[dim:][None, :]


def _layer_kernel(
    # per-batch-row blocks (leading batch dim squeezed via None blocks)
    x_ref,      # (T, C) bf16 activation row
    m_ref,      # (8, T) f32 key-padding mask tile (row 0 used)
    fa_ref,     # (8, 2C) f32 attn-norm FiLM tile (row 0 used)
    ff_ref,     # (8, 2C) f32 ff-norm FiLM tile (row 0 used)
    # attention weights (bf16, whole-array blocks)
    wq_ref,     # (C, C)
    wkv_ref,    # (C, 2C)
    wo_ref,     # (C, C)
    # feed-forward weights (int8 + f32 scales/biases, padded to P lanes)
    wxq_ref, wxs_ref, bx_ref,    # (C, P) int8, (1, P), (1, P)
    wgq_ref, wgs_ref, bg_ref,    # (C, P) int8, (1, P), (1, P)
    wcq_ref, wcs_ref, bc_ref,    # (3P, P) int8, (3, P), (1, P)
    wfq_ref, wfs_ref, bf_ref,    # (P, C) int8, (1, C), (1, C)
    o_ref,      # (T, C) bf16 output row
    *,
    dim: int,
    dim_head: int,
    heads: int,
    pad_inner: int,
):
    C, dh, H, P = dim, dim_head, heads, pad_inner
    x = x_ref[:]                      # [T, C] bf16
    T = x.shape[0]
    mkey = m_ref[0, :]                # [T]
    f32 = jnp.float32

    # ---- attention sublayer ------------------------------------------------
    hn = _norm_film(x, fa_ref[0, :].astype(f32), C).astype(jnp.bfloat16)
    q = jnp.dot(hn, wq_ref[:], preferred_element_type=f32)       # [T, C]
    kv = jnp.dot(hn, wkv_ref[:], preferred_element_type=f32)     # [T, 2C]
    scale = dh ** -0.5
    acc = jnp.zeros((T, C), f32)
    for h in range(H):
        s0 = h * dh
        qh = q[:, s0:s0 + dh].astype(jnp.bfloat16)
        kh = kv[:, s0:s0 + dh].astype(jnp.bfloat16)
        vh = kv[:, C + s0:C + s0 + dh].astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            qh, kh, (((1,), (1,)), ((), ())), preferred_element_type=f32
        ) * scale                                                # [T, T]
        s = jnp.where(mkey[None, :] > 0, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        oh = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )                                                        # [T, dh]
        acc = acc + jax.lax.dot_general(
            oh.astype(jnp.bfloat16), wo_ref[s0:s0 + dh, :],
            (((1,), (0,)), ((), ())), preferred_element_type=f32,
        )
    x1 = x + acc.astype(jnp.bfloat16)

    # ---- feed-forward sublayer (int8 W8A8) ---------------------------------
    hn2 = _norm_film(x1, ff_ref[0, :].astype(f32), C)
    q2, a2 = _quant_act(hn2)
    hx = jax.lax.dot_general(
        q2, wxq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(f32) * a2 * wxs_ref[0, :][None, :] + bx_ref[0, :][None, :]
    hg = jax.lax.dot_general(
        q2, wgq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(f32) * a2 * wgs_ref[0, :][None, :] + bg_ref[0, :][None, :]
    g = (jax.nn.gelu(hg) * hx).astype(jnp.bfloat16)              # GEGLU

    # full (non-depthwise) k=3 causal conv as 3 shifted matmuls; activations
    # quantized once, shifted taps reuse the int8 tensor + scales
    # (reference latent_module.py:887-903; models/layers.py:CausalConv1d)
    q3, a3 = _quant_act(g.astype(f32))
    y = jnp.zeros((T, P), f32)
    for i in range(3):
        shift = 2 - i
        if shift == 0:
            qi, ai = q3, a3
        elif shift >= T:
            continue
        else:
            qi = jnp.concatenate(
                [jnp.zeros((shift, P), jnp.int8), q3[: T - shift]], axis=0
            )
            ai = jnp.concatenate(
                [jnp.ones((shift, 1), f32), a3[: T - shift]], axis=0
            )
        y = y + jax.lax.dot_general(
            qi, wcq_ref[i * P:(i + 1) * P, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(f32) * ai * wcs_ref[i:i + 1, :]
    y = (y + bc_ref[0, :][None, :]).astype(jnp.bfloat16)

    q4, a4 = _quant_act(y.astype(f32))
    out = jax.lax.dot_general(
        q4, wfq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(f32) * a4 * wfs_ref[0, :][None, :] + bf_ref[0, :][None, :]
    o_ref[:] = x1 + out.astype(jnp.bfloat16)


def pack_layer_weights(attn_params, ff_params, inner: int):
    """Quantize/pad one layer's params for the fused kernel.

    attn_params/ff_params: the `attn_i` / `ff_i` subtrees of the
    ConditionableTransformer param dict. Plain jnp ops — loop-invariant
    under a sampling scan, so XLA hoists the packing out of the DDIM loop
    exactly like the ops/quant.py weight quantization."""
    P = _round_up(inner, 128)
    f32, bf16 = jnp.float32, jnp.bfloat16

    def pad_cols(w, n):
        return jnp.pad(w.astype(f32), ((0, 0), (0, n - w.shape[1])))

    def pad_rows(w, n):
        return jnp.pad(w.astype(f32), ((0, n - w.shape[0]), (0, 0)))

    w_in = ff_params["proj_in"]["kernel"]          # [C, 2*inner]
    b_in = ff_params["proj_in"]["bias"].astype(f32)
    wx, ws_x = quantize_weight(pad_cols(w_in[:, :inner], P))
    wg, ws_g = quantize_weight(pad_cols(w_in[:, inner:], P))
    bx = jnp.pad(b_in[:inner], (0, P - inner))[None, :]
    bg = jnp.pad(b_in[inner:], (0, P - inner))[None, :]

    w_conv = ff_params["conv"]["kernel"]           # [3, inner, inner]
    b_conv = ff_params["conv"]["bias"].astype(f32)
    taps, scales = [], []
    for i in range(3):
        wt = pad_rows(pad_cols(w_conv[i], P), P)
        tq, ts = quantize_weight(wt)
        taps.append(tq)
        scales.append(ts)
    wc = jnp.concatenate(taps, axis=0)             # [3P, P]
    ws_c = jnp.concatenate(scales, axis=0)         # [3, P]
    bc = jnp.pad(b_conv, (0, P - inner))[None, :]

    w_out = ff_params["proj_out"]["kernel"]        # [inner, C]
    wf, ws_f = quantize_weight(pad_rows(w_out, P))
    bf_ = ff_params["proj_out"]["bias"].astype(f32)[None, :]

    return {
        "wq": attn_params["to_q"]["kernel"].astype(bf16),
        "wkv": attn_params["to_kv"]["kernel"].astype(bf16),
        "wo": attn_params["to_out"]["kernel"].astype(bf16),
        "wxq": wx, "wxs": ws_x, "bx": bx,
        "wgq": wg, "wgs": ws_g, "bg": bg,
        "wcq": wc, "wcs": ws_c, "bc": bc,
        "wfq": wf, "wfs": ws_f, "bf": bf_,
    }


@functools.partial(
    jax.jit,
    static_argnames=("dim", "dim_head", "heads", "pad_inner", "interpret"),
)
def fused_layer(x, mask, film_attn, film_ff, w, *, dim, dim_head, heads,
                pad_inner, interpret=False):
    """Apply one fused transformer layer.

    x: [B, T, C] bf16; mask: [B, T] bool; film_attn/film_ff: [B, 2C];
    w: dict from pack_layer_weights."""
    B, T, C = x.shape
    P = pad_inner
    kern = functools.partial(
        _layer_kernel, dim=dim, dim_head=dim_head, heads=heads, pad_inner=P
    )
    row = lambda b: (b, 0, 0)
    const2 = lambda b: (0, 0)
    specs = [
        pl.BlockSpec((None, T, C), row, memory_space=pltpu.VMEM),    # x
        pl.BlockSpec((None, 8, T), row, memory_space=pltpu.VMEM),    # mask
        pl.BlockSpec((None, 8, 2 * C), row, memory_space=pltpu.VMEM),  # fa
        pl.BlockSpec((None, 8, 2 * C), row, memory_space=pltpu.VMEM),  # ff
        pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),       # wq
        pl.BlockSpec((C, 2 * C), const2, memory_space=pltpu.VMEM),   # wkv
        pl.BlockSpec((C, C), const2, memory_space=pltpu.VMEM),       # wo
        pl.BlockSpec((C, P), const2, memory_space=pltpu.VMEM),       # wxq
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),       # wxs
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),       # bx
        pl.BlockSpec((C, P), const2, memory_space=pltpu.VMEM),       # wgq
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),       # wgs
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),       # bg
        pl.BlockSpec((3 * P, P), const2, memory_space=pltpu.VMEM),   # wcq
        pl.BlockSpec((3, P), const2, memory_space=pltpu.VMEM),       # wcs
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),       # bc
        pl.BlockSpec((P, C), const2, memory_space=pltpu.VMEM),       # wfq
        pl.BlockSpec((1, C), const2, memory_space=pltpu.VMEM),       # wfs
        pl.BlockSpec((1, C), const2, memory_space=pltpu.VMEM),       # bf
    ]
    # per-batch vectors tiled to sublane-aligned [B, 8, D] blocks (dynamic
    # row reads crash the Mosaic remote compiler; see module docstring)
    mask8 = jnp.broadcast_to(
        mask.astype(jnp.float32)[:, None, :], (B, 8, T)
    )
    fa8 = jnp.broadcast_to(
        film_attn.astype(jnp.float32)[:, None, :], (B, 8, 2 * C)
    )
    ff8 = jnp.broadcast_to(
        film_ff.astype(jnp.float32)[:, None, :], (B, 8, 2 * C)
    )
    out = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=specs,
        out_specs=pl.BlockSpec((None, T, C), row, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.bfloat16),
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16), mask8, fa8, ff8,
        w["wq"], w["wkv"], w["wo"],
        w["wxq"], w["wxs"], w["bx"],
        w["wgq"], w["wgs"], w["bg"],
        w["wcq"], w["wcs"], w["bc"],
        w["wfq"], w["wfs"], w["bf"],
    )
    return out
