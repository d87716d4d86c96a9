"""Shared neural building blocks (flax.linen, batch-first [B, T, D]).

These reproduce the numerics of the reference's latent_module building blocks
(reference: fairseq/models/text_to_speech/latent_module.py — RMSNorm :620-639,
Attention/Attend :221-343/:908-950, FeedForward/GEGLU :881-903, CausalConv1d
:476-488, LearnedSinusoidalPosEmb :104-116) as TPU-friendly XLA graphs:
convolutions via lax.conv_general_dilated in NTC layout, attention as fused
einsum softmax (swap-in point for a Pallas flash kernel in ops/attention.py).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

import os

from diffnorm_tpu.ops.attention import masked_attention

# opt-in fused Pallas RMSNorm+FiLM for the sampling path (see
# ops/pallas_norm.py and PERFORMANCE.md)
_PALLAS_NORM = bool(int(os.environ.get("DIFFNORM_PALLAS_NORM", "0")))

# fused Pallas transformer-layer kernel for the DDIM sampling path
# (ops/pallas_block.py): whole layer per batch row in VMEM, int8 FF
_FUSED_BLOCK = bool(int(os.environ.get("DIFFNORM_FUSED_BLOCK", "0")))
# software-pipelined FF kernel (ops/pallas_ffpipe.py): overlaps row b's
# proj_in/GEGLU with row b-1's conv/proj_out across the batch grid
_FF_PIPE = bool(int(os.environ.get("DIFFNORM_FFPIPE", "0")))
# im2col int8 causal conv (one K=k*C dot instead of k K=C dots); only
# active under a shared per-tensor activation scale (DIFFNORM_INT8_ASCALAR)
_CONVCAT = bool(int(os.environ.get("DIFFNORM_INT8_CONVCAT", "0")))


def l2norm(x, eps: float = 1e-12):
    """F.normalize parity: x / max(||x||_2, eps) along the last axis.

    The square-sum accumulates in f32 without materializing an f32 copy of x
    (profiled: the f32 upcast doubled the HBM traffic of every norm)."""
    sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True, dtype=jnp.float32)
    inv = 1.0 / jnp.maximum(jnp.sqrt(sq), eps)
    return x * inv.astype(x.dtype)


class RMSNorm(nn.Module):
    """L2-normalize * sqrt(dim) * gamma; optional FiLM conditioning.

    When `cond_dim` is set the scale parameter is dropped and (gamma, beta)
    come from a linear projection of the condition vector
    (reference latent_module.py:620-639: adaptive RMSNorm used by the
    diffusion denoiser's transformer with time conditioning).

    `film` lets the caller pass the precomputed projection `to_gamma_beta(
    cond)` — sampling loops hoist these out of the per-step scan so the
    projection weights stream from HBM once instead of once per step
    (see PERFORMANCE.md).
    """

    dim: int
    scale: bool = True
    cond_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.scale:
            self.gamma = self.param(
                "gamma", nn.initializers.ones, (self.dim,), jnp.float32
            )
        if self.cond_dim is not None:
            self.to_gamma_beta = nn.Dense(
                self.dim * 2, dtype=self.dtype, name="to_gamma_beta"
            )

    def film(self, cond):
        """Precompute the conditioning projection ([..., 2*dim])."""
        return self.to_gamma_beta(cond)

    def __call__(self, x, cond=None, film=None):
        if (
            self.cond_dim is not None
            and film is not None
            and x.ndim == 3
            and _PALLAS_NORM
            and jax.devices()[0].platform == "tpu"
        ):
            from diffnorm_tpu.ops.pallas_norm import rms_norm_film

            return rms_norm_film(x, film)
        out = l2norm(x) * math.sqrt(self.dim)
        if self.scale:
            out = out * self.gamma.astype(x.dtype)
        if self.cond_dim is None:
            return out
        gb = film if film is not None else self.to_gamma_beta(cond)
        gamma, beta = jnp.split(gb, 2, axis=-1)
        # cond is [B, C]; broadcast over time
        return out * gamma[:, None, :] + beta[:, None, :]


class Conv1d(nn.Module):
    """1-D convolution over [B, T, C] with 'SAME'-style torch padding k//2."""

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    quant: bool = False  # int8 W8A8 taps (inference only)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size // 2) * self.dilation
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding=[(pad, pad)],
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class CausalConv1d(nn.Module):
    """Left-padded (causal) dilated conv over [B, T, C].

    Parity with reference CausalConv1d (latent_module.py:476-488):
    pad = dilation * (kernel - 1) on the left only.

    TPU lowering: instead of lax.conv_general_dilated (whose dilated-kernel
    path tiles poorly on the MXU), the k-tap conv is computed as k shifted
    [B*T, C_in] x [C_in, C_out] matmuls — each a clean MXU call that XLA
    fuses with the shifts. Parameter layout matches nn.Conv
    ([k, in, out] kernel + [out] bias) so checkpoints are interchangeable.
    """

    features: int
    kernel_size: int = 3
    dilation: int = 1
    use_bias: bool = True
    quant: bool = False  # int8 W8A8 taps (inference only)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_feat = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, in_feat, self.features), jnp.float32,
        ).astype(self.dtype)
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32).astype(self.dtype)
            if self.use_bias else None
        )
        xc = x.astype(self.dtype)
        if self.quant:
            # quantize activations ONCE; shifted taps reuse the int8 tensor
            # and its scales (zero rows shift in as exact zeros). All taps
            # share ONE per-out-channel weight scale (amax over [k, in]) so
            # the per-channel dequant multiply runs once for the whole conv;
            # with a per-tensor activation scale (DIFFNORM_INT8_ASCALAR=1)
            # the taps also share the token scale and the k-term sum stays
            # in int32 with a single dequant at the end.
            from diffnorm_tpu.ops import quant as _q
            from diffnorm_tpu.ops.quant import dequant, site_quantize

            xq, ax = site_quantize(self, xc)
            kf = kernel.astype(jnp.float32)
            w_axes = None if _q._W_SCALAR else (0, 1)
            ws = jnp.max(jnp.abs(kf), axis=w_axes, keepdims=True) / 127.0
            ws = jnp.reshape(ws, (1, 1, -1))
            ws = jnp.maximum(ws, 1e-12)
            wq_all = jnp.round(kf / ws).astype(jnp.int8)
            ws = ws[0]  # [1, out] (or [1, 1] under DIFFNORM_INT8_WSCALAR)
            if ws.size == 1 and ax.size > 1:
                ax = ax * jnp.squeeze(ws)  # scalar ws folds into token scale
                ws = None
        if self.quant and ax.size == 1 and _CONVCAT and self.kernel_size > 1:
            # im2col variant (DIFFNORM_INT8_CONVCAT=1): under a shared
            # per-tensor activation scale the shifted int8 taps concatenate
            # along channels WITHOUT requantizing, so the whole conv is ONE
            # K=k*C int8 dot — deeper contraction sustains the MXU better
            # than k separate K=C dots (roofline: K=512 int8 dots sit below
            # peak), and the epilogue is a single dequant either way.
            taps = []
            for i in range(self.kernel_size):
                shift = (self.kernel_size - 1 - i) * self.dilation
                if shift == 0:
                    taps.append(xq)
                elif shift >= xc.shape[1]:
                    taps.append(jnp.zeros_like(xq))
                else:
                    taps.append(jnp.pad(
                        xq[:, :-shift], ((0, 0), (shift, 0), (0, 0))))
            xcat = jnp.concatenate(taps, axis=-1)  # [B, T, k*C] int8
            wcat = wq_all.reshape(-1, wq_all.shape[-1])  # [k*C, out]
            out = jax.lax.dot_general(
                xcat, wcat, (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            out = dequant(out, ax, ws, self.dtype)
            if bias is not None:
                out = out + bias
            return out

        # each tap's matmul accumulates f32 inside the MXU; the k-term sum
        # stays in the compute dtype (avoids materializing f32 activations —
        # profiled as a major HBM cost in the transformer's conv-FF)
        out = None
        for i in range(self.kernel_size):
            # tap i sees x[t - (k-1-i)*dilation]
            shift = (self.kernel_size - 1 - i) * self.dilation
            if shift >= xc.shape[1] and shift > 0:
                continue  # the whole tap falls before the sequence
            if self.quant:
                xi = xq if shift == 0 else jnp.pad(
                    xq[:, :-shift], ((0, 0), (shift, 0), (0, 0)))
                acc = jax.lax.dot_general(
                    xi, wq_all[i], (((2,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                if ax.size == 1:
                    term = acc  # shared scalar token scale: sum in int32
                else:
                    axi = ax if shift == 0 else jnp.pad(
                        ax[:, :-shift], ((0, 0), (shift, 0), (0, 0)))
                    term = acc.astype(self.dtype) * axi.astype(self.dtype)
            else:
                xi = xc if shift == 0 else jnp.pad(
                    xc[:, :-shift], ((0, 0), (shift, 0), (0, 0)))
                term = jnp.einsum(
                    "btc,cd->btd", xi, kernel[i],
                    preferred_element_type=self.dtype,
                )
            out = term if out is None else out + term
        if self.quant:
            if ax.size == 1:
                out = dequant(out, ax, ws, self.dtype)
            elif ws is not None:  # ws None: scalar already folded into ax
                out = out * ws.astype(self.dtype)
        if bias is not None:
            out = out + bias
        return out


class QDense(nn.Module):
    """Drop-in nn.Dense (same param tree: kernel [in, out] f32 + bias) whose
    contraction optionally runs int8 W8A8 on the MXU (ops/quant.py) — 2x the
    bf16 MXU rate on v5e. Inference-only path: round() has zero gradient."""

    features: int
    use_bias: bool = True
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pre_quant=None):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (x.shape[-1], self.features), jnp.float32,
        )
        if self.quant:
            from diffnorm_tpu.ops.quant import int8_dense, site_quantize

            if pre_quant is None:
                pre_quant = site_quantize(self, x.astype(self.dtype))
            y = int8_dense(x.astype(self.dtype), kernel, pre_quant=pre_quant)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


class GEGLU(nn.Module):
    """x, gate = split(h); gelu(gate) * x (latent_module.py:881-884)."""

    @nn.compact
    def __call__(self, h):
        x, gate = jnp.split(h, 2, axis=-1)
        return jax.nn.gelu(gate) * x


class FeedForward(nn.Module):
    """GEGLU FF with an optional full (dense, groups=1) k=3 causal conv at
    dim_inner (latent_module.py:887-903 — the reference CausalConv1d is a
    plain nn.Conv1d). dim_inner = int(dim * mult * 2/3)."""

    dim: int
    mult: int = 4
    causal_conv: bool = False
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim_inner = int(self.dim * self.mult * 2 / 3)
        h = QDense(dim_inner * 2, quant=self.quant, dtype=self.dtype,
                   name="proj_in")(x)
        h = GEGLU()(h)
        if self.causal_conv:
            h = CausalConv1d(dim_inner, 3, quant=self.quant,
                             dtype=self.dtype, name="conv")(h)
        return QDense(self.dim, quant=self.quant, dtype=self.dtype,
                      name="proj_out")(h)


class Attention(nn.Module):
    """Multi-head attention with key-padding masks.

    Mirrors latent_module.py:908-950: separate q and kv projections (no bias),
    scale = dim_head**-0.5, key-padding `self_mask` ([B, Tk] True=valid),
    optional cross-attention context. Attention dropout is applied to the
    probabilities during training.
    """

    dim: int
    dim_head: int = 64
    heads: int = 8
    dropout: float = 0.0
    quant: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None, deterministic: bool = True):
        h, d = self.heads, self.dim_head
        ctx = x if context is None else context
        pq = None
        if self.quant and context is None:
            # self-attention: q and kv read the SAME tensor — quantize the
            # activations once and let both int8 matmuls reuse the int8
            # tensor + per-token scales (the quant chain is VPU-bound and
            # a visible share of the int8 DDIM step, PERFORMANCE.md)
            from diffnorm_tpu.ops.quant import site_quantize

            pq = site_quantize(self, x.astype(self.dtype))
        q = QDense(h * d, use_bias=False, quant=self.quant, dtype=self.dtype,
                   name="to_q")(x, pre_quant=pq)
        kv = QDense(2 * h * d, use_bias=False, quant=self.quant,
                    dtype=self.dtype, name="to_kv")(ctx, pre_quant=pq)
        k, v = jnp.split(kv, 2, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, h, d).transpose(0, 2, 1, 3)

        q, k, v = map(split_heads, (q, k, v))
        dropout_rng = None
        if self.dropout > 0.0 and not deterministic:
            dropout_rng = self.make_rng("dropout")
        out = masked_attention(
            q, k, v, mask=mask, dropout=self.dropout, dropout_rng=dropout_rng
        )
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        return QDense(self.dim, use_bias=False, quant=self.quant,
                      dtype=self.dtype, name="to_out")(out)


class LearnedSinusoidalPosEmb(nn.Module):
    """Learned-frequency Fourier time embedding (latent_module.py:104-116).

    Input [B] -> output [B, dim + 1] (raw t is concatenated first).
    """

    dim: int

    @nn.compact
    def __call__(self, t):
        assert self.dim % 2 == 0
        w = self.param(
            "weights", nn.initializers.normal(1.0), (self.dim // 2,), jnp.float32
        )
        t = t.astype(jnp.float32)[:, None]
        freqs = t * w[None, :] * 2 * math.pi
        return jnp.concatenate([t, jnp.sin(freqs), jnp.cos(freqs)], axis=-1)


def sinusoidal_positions(mask, dim: int, padding_idx: int = 0):
    """fairseq SinusoidalPositionalEmbedding parity.

    mask: [B, T] bool (True = valid). Positions are padding_idx + cumsum(mask)
    on valid steps, padding_idx elsewhere; the embedding row at padding_idx is
    zeros (reference: fairseq/modules/sinusoidal_positional_embedding.py).
    Returns [B, T, dim] float32.
    """
    mask = jnp.asarray(mask)
    positions = jnp.where(
        mask, jnp.cumsum(mask.astype(jnp.int32), axis=1) + padding_idx, padding_idx
    )
    half = dim // 2
    inv = jnp.exp(jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1)))
    args = positions.astype(jnp.float32)[..., None] * inv[None, None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 0), (0, 1)))
    return jnp.where((positions == padding_idx)[..., None], 0.0, emb)


class ConditionableTransformer(nn.Module):
    """Pre-norm transformer with optional adaptive (time-conditioned) RMSNorm
    and GEGLU-causal-conv feedforward (latent_module.py:642-706).

    `cond_dim` is the dimension of the time-condition vector; when set, every
    norm becomes FiLM-conditioned and un-scaled. Ends with RMSNorm + an
    unbiased Dense (`to_pred`).
    """

    dim: int
    depth: int
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    ff_causal_conv: bool = False
    cond_dim: Optional[int] = None
    cross_attn: bool = False
    dropout: float = 0.1
    quant_int8: bool = False  # int8 W8A8 inference matmuls
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        has_cond = self.cond_dim is not None
        norm_kw = dict(
            dim=self.dim, scale=not has_cond, cond_dim=self.cond_dim,
            dtype=self.dtype,
        )
        self.attn_norms = [
            RMSNorm(**norm_kw, name=f"attn_norm_{i}") for i in range(self.depth)
        ]
        self.attns = [
            Attention(dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                      dropout=self.dropout, quant=self.quant_int8,
                      dtype=self.dtype, name=f"attn_{i}")
            for i in range(self.depth)
        ]
        if self.cross_attn:
            self.cross_norms = [
                RMSNorm(**norm_kw, name=f"cross_norm_{i}")
                for i in range(self.depth)
            ]
            self.cross_attns = [
                Attention(dim=self.dim, dim_head=self.dim_head,
                          heads=self.heads, dropout=self.dropout,
                          dtype=self.dtype, name=f"cross_attn_{i}")
                for i in range(self.depth)
            ]
        self.ff_norms = [
            RMSNorm(**norm_kw, name=f"ff_norm_{i}") for i in range(self.depth)
        ]
        self.ffs = [
            FeedForward(dim=self.dim, mult=self.ff_mult,
                        causal_conv=self.ff_causal_conv,
                        quant=self.quant_int8, dtype=self.dtype,
                        name=f"ff_{i}")
            for i in range(self.depth)
        ]
        self.final_norm = RMSNorm(dim=self.dim, dtype=self.dtype,
                                  name="final_norm")
        self.to_pred = nn.Dense(self.dim, use_bias=False, dtype=self.dtype,
                                name="to_pred")

    def precompute_film(self, cond):
        """Hoist every adaptive-norm projection out of a sampling scan:
        cond [..., cond_dim] -> per-layer dict of [..., 2*dim] tensors."""
        assert self.cond_dim is not None
        out = {"attn": [n.film(cond) for n in self.attn_norms],
               "ff": [n.film(cond) for n in self.ff_norms]}
        if self.cross_attn:
            out["cross"] = [n.film(cond) for n in self.cross_norms]
        return out

    def __call__(self, x, cond=None, mask=None, context=None,
                 deterministic: bool = True, film=None):
        if (
            _FUSED_BLOCK
            and film is not None
            and not self.cross_attn
            and self.ff_causal_conv
            and self.quant_int8
            and deterministic
            and self.cond_dim is not None
            and self.heads * self.dim_head == self.dim
            and self.dtype == jnp.bfloat16  # kernel computes/returns bf16
        ):
            # fused Pallas layer kernel (sampling path; see ops/pallas_block)
            from diffnorm_tpu.ops.pallas_block import (
                _round_up, fused_layer, pack_layer_weights,
            )

            inner = int(self.dim * self.ff_mult * 2 / 3)
            params = self.variables["params"]
            interpret = jax.devices()[0].platform != "tpu"
            kmask = (
                mask if mask is not None
                else jnp.ones(x.shape[:2], dtype=bool)
            )
            for i in range(self.depth):
                w = pack_layer_weights(
                    params[f"attn_{i}"], params[f"ff_{i}"], inner
                )
                x = fused_layer(
                    x, kmask, film["attn"][i], film["ff"][i], w,
                    dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                    pad_inner=_round_up(inner, 128), interpret=interpret,
                )
            x = self.final_norm(x)
            return self.to_pred(x)
        use_ffpipe = (
            _FF_PIPE
            and film is not None
            and self.ff_causal_conv
            and self.quant_int8
            and deterministic
            and self.dtype == jnp.bfloat16
        )
        for i in range(self.depth):
            res = x
            hn = self.attn_norms[i](
                x, cond=cond, film=film["attn"][i] if film else None
            )
            x = res + self.attns[i](hn, mask=mask, deterministic=deterministic)
            if self.cross_attn:
                # cross-attend to resampled prompt latents (no key mask:
                # reference latent_module.py:694-700)
                assert context is not None
                res = x
                hn = self.cross_norms[i](
                    x, cond=cond, film=film["cross"][i] if film else None
                )
                x = res + self.cross_attns[i](
                    hn, context=context, deterministic=deterministic
                )
            if use_ffpipe:
                # pipelined Pallas FF sublayer (norm+FiLM fused in-kernel)
                from diffnorm_tpu.ops.pallas_ffpipe import (
                    _round_up as _ru, ffpipe_layer, pack_ff_weights,
                )

                inner = int(self.dim * self.ff_mult * 2 / 3)
                w = pack_ff_weights(
                    self.variables["params"][f"ff_{i}"], inner
                )
                x = ffpipe_layer(
                    x, film["ff"][i], w, dim=self.dim,
                    pad_inner=_ru(inner, 128),
                    interpret=jax.devices()[0].platform != "tpu",
                )
                continue
            res = x
            hn = self.ff_norms[i](
                x, cond=cond, film=film["ff"][i] if film else None
            )
            x = res + self.ffs[i](hn)
        x = self.final_norm(x)
        return self.to_pred(x)
