"""Int8 (W8A8) inference matmuls.

v5e's MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS), and the DDIM
denoiser is FLOP-bound in its transformer feed-forward (PERFORMANCE.md
component split), so an int8 path roughly doubles the headline ceiling.

Scheme: symmetric per-output-channel weight scales x symmetric per-token
activation scales (standard W8A8 dynamic quantization). Weights are
quantized ON THE FLY from the float params inside jit — under a sampling
`lax.scan` the weight quantization is loop-invariant and XLA hoists it, so
the scan body runs pure int8 matmuls with no parameter-tree changes and no
separate checkpoint format.

Opt-in: cfg `quant_int8` (models/diffusion.py build_model) or the
DIFFNORM_INT8=1 env var. Inference-only — the float params remain the
source of truth for training.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Dequantize in bf16 instead of f32 (halves the elementwise traffic of the
# dequant chain; adds ~0.4% relative error on top of the ~1% int8 error —
# bound pinned by tests/test_pallas_ops.py::test_bf16_dequant_error_bound).
# Measured faster on v5e where the int8 step is elementwise-bound.
# Positively-named knob, default ON (the measured-faster setting):
# DIFFNORM_INT8_DEQ_BF16=0 restores the f32 epilogue.
_DEQ_BF16 = os.environ.get("DIFFNORM_INT8_DEQ_BF16", "1") == "1"


_QUANT_BF16 = os.environ.get("DIFFNORM_INT8_QUANT_BF16", "0") == "1"

# Coarser scale granularities (both opt-in; the int8 DDIM step is
# VPU-op-count-bound — PERFORMANCE.md — and each knob removes one full
# [B, T, C] multiply from every dequant epilogue):
#  DIFFNORM_INT8_WSCALAR=1 — per-TENSOR weight scales: ws becomes a scalar
#    that folds into the per-token activation scale, so dequant is a single
#    elementwise multiply instead of two.
#  DIFFNORM_INT8_ASCALAR=1 — per-TENSOR activation scales: ax becomes a
#    scalar; shifted causal-conv taps then share one scale and can
#    accumulate in int32, collapsing the conv epilogue to one dequant.
_W_SCALAR = os.environ.get("DIFFNORM_INT8_WSCALAR", "0") == "1"
_A_SCALAR = os.environ.get("DIFFNORM_INT8_ASCALAR", "0") == "1"


def quantize_weight(w):
    """w: [in, out] float -> (int8 [in, out], scale).

    Scale is per-out-channel [1, out] by default; a per-tensor scalar
    [1, 1] under DIFFNORM_INT8_WSCALAR=1 (folds into the per-token scale
    at dequant — one fewer multiply per output element)."""
    wf = w.astype(jnp.float32)
    if _W_SCALAR:
        ws = jnp.max(jnp.abs(wf)).reshape((1,) * w.ndim) / 127.0
    else:
        ws = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
    ws = jnp.maximum(ws, 1e-12)
    wq = jnp.round(wf / ws).astype(jnp.int8)
    return wq, ws


def quantize_act(x):
    """x: [..., in] float -> (int8 x, scale).

    Scale is per-token [..., 1] by default, a per-tensor scalar under
    DIFFNORM_INT8_ASCALAR=1. Shared by every int8 matmul so call sites
    with a common input (q/kv projections, causal-conv taps) can quantize
    ONCE and reuse the int8 tensor + scales. DIFFNORM_INT8_QUANT_BF16=1
    keeps the abs-max/divide chain in bf16 (halves its element traffic; the
    max*(1/127) product and the quotient each round at bf16's 2^-9 relative,
    compounding to ~1 int8 ulp of extra error; the quotient is clamped to
    [-127, 127] so the compounded rounding can never overflow the cast)."""
    axes = None if _A_SCALAR else -1

    def _keep(r):
        return r.reshape((1,) * x.ndim) if _A_SCALAR else r

    if _QUANT_BF16 and x.dtype == jnp.bfloat16:
        ax = _keep(jnp.max(jnp.abs(x), axis=axes, keepdims=not _A_SCALAR)) * (
            jnp.bfloat16(1.0 / 127.0))
        ax = jnp.maximum(ax, jnp.bfloat16(1e-12))
        # the bf16 max*(1/127) product and the division each round at 2^-9
        # relative; compounded they can push the row max past 127.5, and an
        # out-of-range float->int8 convert is implementation-defined (could
        # wrap to -128) — clamp before the cast
        xq = jnp.clip(jnp.round(x / ax), -127.0, 127.0).astype(jnp.int8)
        return xq, ax
    ax = _keep(jnp.max(
        jnp.abs(x.astype(jnp.float32)), axis=axes, keepdims=not _A_SCALAR
    )) / 127.0
    ax = jnp.maximum(ax, 1e-12)
    xq = jnp.round(x.astype(jnp.float32) / ax).astype(jnp.int8)
    return xq, ax


def _env1(name: str) -> bool:
    # read at call (=trace) time so one process can calibrate then switch
    return os.environ.get(name, "0") == "1"


def quantize_act_static(x, amax):
    """Quantize with a pre-calibrated per-tensor amax: NO max-abs reduce.

    The dynamic quantizers above need a full reduction over x before the
    scale multiply can start, which serializes a second elementwise pass
    over the tensor; with a static scale the whole quantize chain fuses
    into the producing op. The int8 DDIM step is VPU-issue-bound on exactly
    these chains (PERFORMANCE.md roofline), hence DIFFNORM_INT8_STATIC."""
    ax = jnp.maximum(amax.astype(jnp.float32), 1e-10).reshape(
        (1,) * x.ndim) / 127.0
    if _QUANT_BF16 and x.dtype == jnp.bfloat16:
        # bf16 divide/round chain (same DIFFNORM_INT8_QUANT_BF16 semantics
        # and clamp rationale as the dynamic path above)
        xq = jnp.clip(jnp.round(x / ax.astype(jnp.bfloat16)),
                      -127.0, 127.0).astype(jnp.int8)
        return xq, ax
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / ax),
                  -127.0, 127.0).astype(jnp.int8)
    return xq, ax


def site_quantize(mod, x, name: str = "act_amax"):
    """Module-site activation quantization with calibrated-scale support.

    DIFFNORM_INT8_CALIB=1: dynamic quantize AND record the running
    per-site amax into the mutable 'quant_stats' collection (apply with
    mutable=["quant_stats"], e.g. models/diffusion.calibrate_act_scales).
    DIFFNORM_INT8_STATIC=1: use the calibrated scalar scale when this
    site has one (falls back to dynamic quantization when absent)."""
    if _env1("DIFFNORM_INT8_STATIC") and mod.has_variable(
            "quant_stats", name):
        return quantize_act_static(x, mod.get_variable("quant_stats", name))
    xq, ax = quantize_act(x)
    if _env1("DIFFNORM_INT8_CALIB"):
        v = mod.variable("quant_stats", name,
                         lambda: jnp.zeros((), jnp.float32))
        v.value = jnp.maximum(v.value,
                              jnp.max(ax).astype(jnp.float32) * 127.0)
    return xq, ax


def calibrate_apply(apply_fn, variables, *args, **kwargs):
    """Generic static-scale calibration: run `apply_fn(variables, *args,
    mutable=["quant_stats"], **kwargs)` once with calibration mode on and
    return `variables` with the recorded per-site amax collection merged
    (models/diffusion.calibrate_act_scales is the multi-timestep variant
    for the DDIM denoiser)."""
    old = os.environ.get("DIFFNORM_INT8_CALIB")
    os.environ["DIFFNORM_INT8_CALIB"] = "1"
    try:
        _, mutated = apply_fn(variables, *args,
                              mutable=["quant_stats"], **kwargs)
    finally:
        if old is None:
            os.environ.pop("DIFFNORM_INT8_CALIB", None)
        else:
            os.environ["DIFFNORM_INT8_CALIB"] = old
    stats = mutated.get("quant_stats")
    if not stats:
        return variables
    return {**variables, "quant_stats": stats}


def int8_matmul(x, wq, ws, pre_quant=None):
    """x: [..., in] float; wq/ws from quantize_weight. Returns [..., out]
    in x.dtype. Per-token dynamic activation quantization; the contraction
    runs int8 x int8 -> int32 on the MXU. `pre_quant=(xq, ax)` skips the
    activation quantization (caller already quantized this input)."""
    xq, ax = pre_quant if pre_quant is not None else quantize_act(x)
    y = jax.lax.dot_general(
        xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return dequant(y, ax, ws, x.dtype)


def dequant(acc, ax, ws, out_dtype):
    """int32 accumulator x per-token scale x per-channel scale -> out_dtype.

    In bf16 the whole epilogue stays bf16 (halves its register/HBM
    footprint, ~0.4% added relative error under the ~1% int8 error);
    DIFFNORM_INT8_DEQ_BF16=0 restores the f32 epilogue. The single shared
    implementation for int8_matmul, CausalConv1d taps, and the fused
    Pallas block's packing."""
    if ws.size == 1 or ax.size == 1:
        # a scalar scale folds into the other (tiny or scalar) scale tensor:
        # the wide [..., out] accumulator is multiplied exactly once
        scale = (ax * jnp.squeeze(ws)) if ws.size == 1 else (ws * jnp.squeeze(ax))
        if _DEQ_BF16 and out_dtype == jnp.bfloat16:
            return acc.astype(jnp.bfloat16) * scale.astype(jnp.bfloat16)
        return (acc.astype(jnp.float32) * scale).astype(out_dtype)
    if _DEQ_BF16 and out_dtype == jnp.bfloat16:
        return (
            acc.astype(jnp.bfloat16)
            * ax.astype(jnp.bfloat16)
            * ws.astype(jnp.bfloat16)
        )
    return (acc.astype(jnp.float32) * ax * ws).astype(out_dtype)


def int8_dense(x, w, pre_quant=None):
    """One-shot helper: quantize w and contract (the quantization is
    loop-invariant under scan and gets hoisted by XLA)."""
    wq, ws = quantize_weight(w)
    return int8_matmul(x, wq, ws, pre_quant=pre_quant)
