"""Software-pipelined GEGLU-conv feed-forward kernel for the DDIM denoiser.

The int8 DDIM step is VPU-issue-bound: XLA (and a naive fused kernel,
ops/pallas_block.py) serialize the FF chain's MXU matmuls and VPU
epilogues because each stage depends on the previous one. This kernel
breaks the serialization ACROSS batch rows: one grid step runs

    first half  (row b):   norm+FiLM -> quantize -> proj_in x2 -> GEGLU
    second half (row b-1): conv taps -> re-quantize -> proj_out -> residual

The two halves touch different rows (double-buffered VMEM scratch holds
the GEGLU output between grid steps), so their MXU and VPU instruction
streams are independent and the VLIW scheduler may overlap them — the
"pipelined variant" sketched in PERFORMANCE.md after the monolithic fused
block measured slower than XLA.

Numerics match models/layers.py FeedForward with quant=True and per-token
activation scales (reference FF: latent_module.py:887-903). Weights pack
once per sampling call (loop-invariant, hoisted by XLA like ops/quant.py).

Opt-in: DIFFNORM_FFPIPE=1 (sampling path of ConditionableTransformer).
Mosaic-remote-compiler constraints honored (see ops/pallas_block.py):
sublane-aligned per-row tiles, no dynamic VMEM row reads, static shifts.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from diffnorm_tpu.ops.quant import quantize_weight


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _quant_act(v):
    """Per-token symmetric int8: v f32 [T, D] -> (int8, scale [T, 1])."""
    a = jnp.maximum(
        jnp.max(jnp.abs(v), axis=-1, keepdims=True) / 127.0, 1e-12
    )
    return jnp.round(v / a).astype(jnp.int8), a


def _norm_film(v, gb, dim: int):
    """Scale-free RMSNorm * sqrt(dim) then FiLM (latent_module.py:620-639)."""
    vf = v.astype(jnp.float32)
    sq = jnp.sum(vf * vf, axis=-1, keepdims=True)
    n = vf * (dim ** 0.5 / jnp.maximum(jnp.sqrt(sq), 1e-12))
    return n * gb[:dim][None, :] + gb[dim:][None, :]


def _ff_second_half(g, x_prev, wcq_ref, wcs_ref, bc_ref, wfq_ref, wfs_ref,
                    bf_ref, pad_inner: int):
    """conv taps -> requantize -> proj_out -> residual for one row."""
    f32 = jnp.float32
    P = pad_inner
    T = x_prev.shape[0]
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
    y = y + bc_ref[0, :][None, :]
    q4, a4 = _quant_act(y)
    out = jax.lax.dot_general(
        q4, wfq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(f32) * a4 * wfs_ref[0, :][None, :] + bf_ref[0, :][None, :]
    return x_prev + out.astype(jnp.bfloat16)


def _ff_first_half(x, gb, wxq_ref, wxs_ref, bx_ref, wgq_ref, wgs_ref, bg_ref,
                   dim: int):
    """norm+FiLM -> quantize -> proj_in x2 -> GEGLU for one row."""
    f32 = jnp.float32
    hn = _norm_film(x, gb, dim)
    q, a = _quant_act(hn)
    hx = jax.lax.dot_general(
        q, wxq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(f32) * a * wxs_ref[0, :][None, :] + bx_ref[0, :][None, :]
    hg = jax.lax.dot_general(
        q, wgq_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(f32) * a * wgs_ref[0, :][None, :] + bg_ref[0, :][None, :]
    return (jax.nn.gelu(hg) * hx).astype(jnp.bfloat16)


def _ffpipe_kernel2(
    x_cur_ref,   # (2, T, C) bf16 — row pair min(b, B2-1)
    x_prev_ref,  # (2, T, C) bf16 — row pair max(b-1, 0)
    f_cur_ref,   # (2, 8, 2C) f32 FiLM tiles for the current pair
    wxq_ref, wxs_ref, bx_ref,
    wgq_ref, wgs_ref, bg_ref,
    wcq_ref, wcs_ref, bc_ref,
    wfq_ref, wfs_ref, bf_ref,
    o_ref,       # (2, T, C) bf16 — row pair max(b-1, 0)
    g0a_ref, g0b_ref, g1a_ref, g1b_ref,  # scratch: (T, P) double buffers x2
    *,
    dim: int,
    pad_inner: int,
    n_pairs: int,
):
    """Two rows per grid step (DIFFNORM_FFPIPE_ROWS=2): four independent
    MXU/VPU chains in flight per step instead of two, giving the VLIW
    scheduler more interleaving freedom at 2x the scratch footprint."""
    b = pl.program_id(0)
    f32 = jnp.float32

    @pl.when(b > 0)
    def _second():
        for r in range(2):
            bufs = (g0a_ref, g1a_ref) if r == 0 else (g0b_ref, g1b_ref)
            g = jax.lax.cond((b - 1) % 2 == 0,
                             lambda: bufs[0][:], lambda: bufs[1][:])
            o_ref[r] = _ff_second_half(
                g, x_prev_ref[r], wcq_ref, wcs_ref, bc_ref,
                wfq_ref, wfs_ref, bf_ref, pad_inner)

    @pl.when(b < n_pairs)
    def _first():
        for r in range(2):
            # [1, 2C] slice then reshape: a double int index on a 3-D VMEM
            # ref lowers to an unsupported gather (Mosaic remote compiler)
            gb = f_cur_ref[r][0:1, :].reshape(-1).astype(f32)
            g = _ff_first_half(
                x_cur_ref[r], gb,
                wxq_ref, wxs_ref, bx_ref, wgq_ref, wgs_ref, bg_ref, dim)
            bufs = (g0a_ref, g1a_ref) if r == 0 else (g0b_ref, g1b_ref)

            @pl.when(b % 2 == 0)
            def _(g=g, bufs=bufs):
                bufs[0][:] = g

            @pl.when(b % 2 == 1)
            def _(g=g, bufs=bufs):
                bufs[1][:] = g


def _ffpipe_kernel(
    x_cur_ref,   # (T, C) bf16 — row min(b, B-1)
    x_prev_ref,  # (T, C) bf16 — row max(b-1, 0)
    f_cur_ref,   # (8, 2C) f32 FiLM tile for row min(b, B-1)
    wxq_ref, wxs_ref, bx_ref,   # (C, P) int8, (1, P), (1, P)
    wgq_ref, wgs_ref, bg_ref,   # (C, P) int8, (1, P), (1, P)
    wcq_ref, wcs_ref, bc_ref,   # (3P, P) int8, (3, P), (1, P)
    wfq_ref, wfs_ref, bf_ref,   # (P, C) int8, (1, C), (1, C)
    o_ref,       # (T, C) bf16 — row max(b-1, 0)
    g0_ref, g1_ref,  # scratch: (T, P) bf16 double buffer of GEGLU outputs
    *,
    dim: int,
    pad_inner: int,
    n_rows: int,
):
    C, P, B = dim, pad_inner, n_rows
    b = pl.program_id(0)
    f32 = jnp.float32

    del P
    # ---- second half: row b-1 (conv + proj_out + residual) — skipped at b=0
    # (emitted first: its MXU-heavy stream leads, the next row's VPU-heavy
    # prologue below can fill the MXU gaps — both halves are independent)
    @pl.when(b > 0)
    def _second():
        g = jax.lax.cond((b - 1) % 2 == 0,
                         lambda: g0_ref[:], lambda: g1_ref[:])
        o_ref[:] = _ff_second_half(
            g, x_prev_ref[:], wcq_ref, wcs_ref, bc_ref,
            wfq_ref, wfs_ref, bf_ref, pad_inner)

    # ---- first half: row b (prologue + GEGLU) — skipped on the drain step
    @pl.when(b < B)
    def _first():
        g = _ff_first_half(
            x_cur_ref[:], f_cur_ref[0, :].astype(f32),
            wxq_ref, wxs_ref, bx_ref, wgq_ref, wgs_ref, bg_ref, C)

        @pl.when(b % 2 == 0)
        def _():
            g0_ref[:] = g

        @pl.when(b % 2 == 1)
        def _():
            g1_ref[:] = g


def pack_ff_weights(ff_params, inner: int):
    """Quantize/pad one FF sublayer's params (proj_in/conv/proj_out) for the
    pipelined kernel. Plain jnp ops — loop-invariant under a sampling scan."""
    P = _round_up(inner, 128)
    f32 = jnp.float32

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
        tq, ts = quantize_weight(pad_rows(pad_cols(w_conv[i], P), P))
        taps.append(tq)
        scales.append(jnp.reshape(ts, (1, -1)))
    wc = jnp.concatenate(taps, axis=0)             # [3P, P]
    ws_c = jnp.concatenate(
        [jnp.broadcast_to(s, (1, P)) for s in scales], axis=0)  # [3, P]
    bc = jnp.pad(b_conv, (0, P - inner))[None, :]

    w_out = ff_params["proj_out"]["kernel"]        # [inner, C]
    wf, ws_f = quantize_weight(pad_rows(w_out, P))
    ws_f = jnp.broadcast_to(jnp.reshape(ws_f, (1, -1)), (1, w_out.shape[1]))
    bf_ = ff_params["proj_out"]["bias"].astype(f32)[None, :]

    return {
        "wxq": wx, "wxs": jnp.broadcast_to(jnp.reshape(ws_x, (1, -1)), (1, P)),
        "bx": bx,
        "wgq": wg, "wgs": jnp.broadcast_to(jnp.reshape(ws_g, (1, -1)), (1, P)),
        "bg": bg,
        "wcq": wc, "wcs": ws_c, "bc": bc,
        "wfq": wf, "wfs": ws_f, "bf": bf_,
    }


@functools.partial(
    jax.jit, static_argnames=("dim", "pad_inner", "interpret", "rows")
)
def ffpipe_layer(x, film_ff, w, *, dim, pad_inner, interpret=False,
                 rows: int = 0):
    """x: [B, T, C] bf16 (post-attention residual stream); film_ff: [B, 2C].
    Returns x + FF(norm_film(x)) in bf16. rows=2 (or
    DIFFNORM_FFPIPE_ROWS=2) processes row pairs per grid step."""
    B, T, C = x.shape
    P = pad_inner
    if rows == 0:
        rows = int(os.environ.get("DIFFNORM_FFPIPE_ROWS", "1"))
    if rows == 2 and B % 2 == 0 and B >= 4:
        return _ffpipe_layer2(x, film_ff, w, dim=dim, pad_inner=P,
                              interpret=interpret)
    kern = functools.partial(
        _ffpipe_kernel, dim=dim, pad_inner=P, n_rows=B
    )
    cur = lambda b: (jnp.minimum(b, B - 1), 0, 0)
    prev = lambda b: (jnp.maximum(b - 1, 0), 0, 0)
    const2 = lambda b: (0, 0)
    specs = [
        pl.BlockSpec((None, T, C), cur, memory_space=pltpu.VMEM),    # x row b
        pl.BlockSpec((None, T, C), prev, memory_space=pltpu.VMEM),   # x row b-1
        pl.BlockSpec((None, 8, 2 * C), cur, memory_space=pltpu.VMEM),  # film b
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
    f8 = jnp.broadcast_to(
        film_ff.astype(jnp.float32)[:, None, :], (B, 8, 2 * C)
    )
    out = pl.pallas_call(
        kern,
        grid=(B + 1,),
        in_specs=specs,
        out_specs=pl.BlockSpec((None, T, C), prev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((T, P), jnp.bfloat16),
            pltpu.VMEM((T, P), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), f8,
        w["wxq"], w["wxs"], w["bx"],
        w["wgq"], w["wgs"], w["bg"],
        w["wcq"], w["wcs"], w["bc"],
        w["wfq"], w["wfs"], w["bf"],
    )
    return out


def _ffpipe_layer2(x, film_ff, w, *, dim, pad_inner, interpret=False):
    """Two rows per grid step (DIFFNORM_FFPIPE_ROWS=2): block dim 2 on
    batch, four scratch buffers (double-buffer pairs per row slot)."""
    B, T, C = x.shape
    P = pad_inner
    B2 = B // 2
    kern = functools.partial(
        _ffpipe_kernel2, dim=dim, pad_inner=P, n_pairs=B2
    )
    cur = lambda b: (jnp.minimum(b, B2 - 1), 0, 0)
    prev = lambda b: (jnp.maximum(b - 1, 0), 0, 0)
    const2 = lambda b: (0, 0)
    specs = [
        pl.BlockSpec((2, T, C), cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, T, C), prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((2, 8, 2 * C), cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((C, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3 * P, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((3, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, P), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((P, C), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, C), const2, memory_space=pltpu.VMEM),
    ]
    f8 = jnp.broadcast_to(
        film_ff.astype(jnp.float32)[:, None, :], (B, 8, 2 * C)
    )
    return pl.pallas_call(
        kern,
        grid=(B2 + 1,),
        in_specs=specs,
        out_specs=pl.BlockSpec((2, T, C), prev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, C), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((T, P), jnp.bfloat16),
            pltpu.VMEM((T, P), jnp.bfloat16),
            pltpu.VMEM((T, P), jnp.bfloat16),
            pltpu.VMEM((T, P), jnp.bfloat16),
        ],
        interpret=interpret,
    )(
        x.astype(jnp.bfloat16), x.astype(jnp.bfloat16), f8,
        w["wxq"], w["wxs"], w["bx"],
        w["wgq"], w["wgs"], w["bg"],
        w["wcq"], w["wcs"], w["bc"],
        w["wfq"], w["wfs"], w["bf"],
    )
