"""Space-to-depth packed 1-D convolutions for small-channel HiFi-GAN stages.

The vocoder's last upsample stages run dilated convs at waveform rate with
16/32/64 channels. On TPU a conv keeps channels in the 128-wide lane
dimension, so those stages use 1/8..1/2 of every vector register and MXU
tile — measured ~2-3% MXU utilization and 75% of vocoder wall time
(PERFORMANCE.md per-stage profile).

Packing fixes the layout instead of the op: reshape [B, T, C] into
[B, T/P, P*C] with P = 128//C, and express a SAME dilated conv as a small
sum of dense [P*C, P*C] matmuls over shifted packed rows:

    y[q*P + p] = sum_j w[j] . x[q*P + p + off_j]
               = sum_s  xp[q + s] @ W_s        (s = floor((p+off_j)/P))

where W_s gathers every (tap j, output phase p) pair that lands s packed
rows away — a block-sparse [P*C, P*C] matrix built once from the conv
kernel at trace time (loop-invariant; XLA hoists it out of any sampling
loop). This multiplies FLOPs by roughly (P*C)/(k*C) per tap but runs them
at full MXU width; measured net win on the narrow stages.

Numerics are exact up to matmul reassociation (f32 accumulation both ways).
"""

from __future__ import annotations

import os

import jax.numpy as jnp

LRELU_SLOPE = 0.1

# int8 W8A8 packed convs (DIFFNORM_INT8_VOCODER=1): every W_s block is a
# placement of the SAME [k, C, C] kernel's values, so one per-tensor kernel
# scale is exact across shifts — terms accumulate in int32 on the MXU (2x
# the bf16 rate) with a single scalar dequant at the end. Activations take
# one per-tensor scale per conv input (shifted views reuse the int8 tensor).
_INT8 = os.environ.get("DIFFNORM_INT8_VOCODER", "0") == "1"


def pack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, T, C] -> [B, T/P, P*C] (T must divide P)."""
    b, t, c = x.shape
    assert t % p == 0, (t, p)
    return x.reshape(b, t // p, p * c)


def unpack(x: jnp.ndarray, p: int) -> jnp.ndarray:
    """[B, Q, P*C] -> [B, Q*P, C]."""
    b, q, pc = x.shape
    return x.reshape(b, q * p, pc // p)


def _tap_offsets(k: int, dilation: int):
    """SAME-padding torch semantics (pad = (k*d - d)//2): tap j reads
    x[t + (j - (k-1)//2) * d] for odd k."""
    assert k % 2 == 1, "HiFi-GAN resblock kernels are odd"
    return [(j - (k - 1) // 2) * dilation for j in range(k)]


def packed_conv_matrices(kernel: jnp.ndarray, p: int, dilation: int):
    """kernel: [k, C, C] (flax layout) -> list of (shift s, W_s [P*C, P*C])
    with y_packed[q] = sum_s xp[q+s] @ W_s."""
    k, cin, cout = kernel.shape
    assert cin == cout, "resblock convs are square"
    c = cin
    offsets = _tap_offsets(k, dilation)
    shifts = sorted({(ph + off) // p for ph in range(p) for off in offsets})
    # the block placement is static (python loops over taps x phases); the
    # kernel values flow through jnp updates so params/gradients trace
    out = []
    for s in shifts:
        w = jnp.zeros((p * c, p * c), kernel.dtype)
        for j, off in enumerate(offsets):
            for ph in range(p):
                if (ph + off) // p != s:
                    continue
                ph_src = (ph + off) % p
                w = w.at[
                    ph_src * c:(ph_src + 1) * c, ph * c:(ph + 1) * c
                ].add(kernel[j])
        out.append((s, w))
    return out


def packed_same_conv(xp: jnp.ndarray, kernel: jnp.ndarray,
                     bias: jnp.ndarray | None, p: int,
                     dilation: int, quant: bool | None = None,
                     act_amax=None) -> jnp.ndarray:
    """SAME dilated conv on packed input xp [B, Q, P*C] -> [B, Q, P*C].

    `act_amax`: pre-calibrated per-tensor activation amax — skips the
    max-abs reduce (the extra full pass over the waveform-rate activations
    that made dynamic int8 a 7% LOSS here; see PERFORMANCE.md)."""
    q = xp.shape[1]
    quant = _INT8 if quant is None else quant
    out_dtype = xp.dtype
    if quant:
        # per-tensor int8: kernel scale shared by every W_s block (exact),
        # activation scale shared by every shifted view (same tensor)
        k_scale = jnp.maximum(jnp.max(jnp.abs(kernel)) / 127.0, 1e-12)
        kernel = jnp.round(kernel.astype(jnp.float32) / k_scale
                           ).astype(jnp.int8)
        if act_amax is not None:
            # shared static-quant implementation (honors
            # DIFFNORM_INT8_QUANT_BF16 — no f32 materialization of the
            # waveform-rate tensor)
            from diffnorm_tpu.ops.quant import quantize_act_static

            xp, a_scale = quantize_act_static(xp, act_amax)
        else:
            a_scale = jnp.maximum(
                jnp.max(jnp.abs(xp.astype(jnp.float32))) / 127.0, 1e-12)
            xp = jnp.round(xp.astype(jnp.float32) / a_scale).astype(jnp.int8)
    acc = None
    for s, w in packed_conv_matrices(kernel, p, dilation):
        if s == 0:
            xs = xp
        elif s > 0:
            if s >= q:
                continue
            xs = jnp.pad(xp[:, s:], ((0, 0), (0, s), (0, 0)))
        else:
            if -s >= q:
                continue
            xs = jnp.pad(xp[:, :s], ((0, 0), (-s, 0), (0, 0)))
        if quant:
            term = jnp.einsum("bqc,cd->bqd", xs, w,
                              preferred_element_type=jnp.int32)
        else:
            term = jnp.einsum("bqc,cd->bqd", xs, w.astype(xp.dtype),
                              preferred_element_type=xp.dtype)
        acc = term if acc is None else acc + term
    if quant:
        acc = (acc.astype(jnp.float32) * (a_scale * k_scale)).astype(out_dtype)
    if bias is not None:
        acc = acc + jnp.tile(bias.astype(acc.dtype), p)[None, None, :]
    return acc


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def packed_resblock(xp: jnp.ndarray, params, kernel_size: int,
                    dilations, p: int,
                    valid_len: int | None = None,
                    amaxes=None, observe: bool = False):
    """HiFi-GAN ResBlock (models/hifigan.py:37-60) on packed activations:
    for each dilation d: x += conv2(lrelu(conv1_d(lrelu(x)))).

    `valid_len` (unpacked frames) must be passed when the input was padded
    to a multiple of P: conv biases make padded frames non-zero, and the
    next conv's left taps would leak them back into valid frames — zeroing
    the tail after every conv reproduces SAME-padding semantics exactly.

    Static int8 support: `amaxes` [2*len(dilations)] supplies calibrated
    per-conv activation amaxes; `observe=True` instead returns
    (xp, observed_amaxes) for calibration."""
    mask = None
    if valid_len is not None and valid_len < xp.shape[1] * p:
        c = xp.shape[-1] // p
        flat = jnp.arange(xp.shape[1] * p) < valid_len
        mask = jnp.repeat(flat, c).reshape(xp.shape[1], p * c)[None]
        mask = mask.astype(xp.dtype)
    observed = [] if observe else None
    for j, d in enumerate(dilations):
        h = _lrelu(xp)
        if observe:
            # reduce in the native dtype, cast one scalar (calibration runs
            # eagerly through the tunnel; an f32 copy of the waveform-rate
            # tensor per site is pure waste)
            observed.append(jnp.max(jnp.abs(h)).astype(jnp.float32))
        c1 = params[f"conv1_{j}"]
        h = packed_same_conv(
            h, c1["kernel"], c1["bias"], p, d,
            act_amax=None if amaxes is None else amaxes[2 * j])
        if mask is not None:
            h = h * mask
        h = _lrelu(h)
        if observe:
            observed.append(jnp.max(jnp.abs(h)).astype(jnp.float32))
        c2 = params[f"conv2_{j}"]
        h = packed_same_conv(
            h, c2["kernel"], c2["bias"], p, 1,
            act_amax=None if amaxes is None else amaxes[2 * j + 1])
        if mask is not None:
            h = h * mask
        xp = xp + h
    if observe:
        return xp, jnp.stack(observed)
    return xp


class PolyphaseConvTranspose:
    """Polyphase transposed 1-D conv: the HiFi-GAN upsample stages
    (hifigan.py:111-170 ConvTranspose1d stride u) re-expressed as ONE
    einsum whose contraction is M*C_in (M = ceil(k/u) taps per phase)
    instead of XLA's conv-transpose lowering — the round-3 "transposed-conv
    output-tiling" lever without leaving XLA.

    y_full[u*q + p] = sum_m x[q - m] . W[u*m + p]   (polyphase identity)

    so stacking M shifted views of x and zero-padding the kernel to u*M
    taps turns the whole stage into [B, T', M*C_in] @ [M*C_in, u*C_out],
    followed by the same (k-u)//2 crop the torch padding applies. Exact up
    to matmul reassociation (parity-tested vs nn.ConvTranspose in
    tests/test_packed_vocoder.py). Parameter layout is IDENTICAL to
    flax nn.ConvTranspose(transpose_kernel=True): kernel [k, C_out, C_in],
    bias [C_out] — checkpoints swap in unchanged.
    """

    @staticmethod
    def apply(x, kernel, bias, stride: int, dtype=None):
        k, co, ci = kernel.shape
        u = stride
        m_taps = -(-k // u)
        r_pad = -(-(k - u) // u) if k > u else 0
        wp = jnp.zeros((u * m_taps, co, ci), kernel.dtype)
        wp = wp.at[:k].set(kernel)
        wp = wp.reshape(m_taps, u, co, ci)
        if dtype is not None:
            wp = wp.astype(dtype)
            x = x.astype(dtype)
        xp = jnp.pad(x, ((0, 0), (m_taps - 1, r_pad), (0, 0)))
        tq = xp.shape[1] - (m_taps - 1)
        xw = jnp.stack(
            [xp[:, (m_taps - 1) - m: (m_taps - 1) - m + tq]
             for m in range(m_taps)], axis=2)
        y = jnp.einsum("bqmc,mpoc->bqpo", xw, wp,
                       preferred_element_type=jnp.float32)
        y = y.reshape(x.shape[0], tq * u, co)
        c = (k - u) // 2
        out = y[:, c: c + x.shape[1] * u]
        if dtype is not None:
            out = out.astype(dtype)
        return out + bias
