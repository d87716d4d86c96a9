"""Code-HiFi-GAN unit-to-waveform vocoder.

Capability parity with fairseq/models/text_to_speech/{hifigan.py,
codehifigan.py, fastspeech2.py:VariancePredictor} + the runtime wrapper
(vocoder.py:214-243):

* Generator: conv_pre (k7) -> [leaky_relu -> transposed-conv upsample ->
  mean of MRF ResBlocks] per stage -> leaky_relu -> conv_post -> tanh
* ResBlock: dilated conv pairs (dilations e.g. 1/3/5) with leaky-relu
* CodeGenerator: unit embedding table, optional duration predictor
  (log-duration -> round(exp(d)-1) clamp>=1 -> repeat_interleave), optional
  speaker embedding upsampled and concatenated
* CodeHiFiGANVocoder: strips invalid (< 0) codes, optional consecutive-dedup,
  loads converted `generator` weights (weight-norm folded at conversion)

Transposed convs lower to lax.conv_transpose in NWC layout; the full
unit->waveform graph jits into one program per (length-bucket) shape.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

LRELU_SLOPE = 0.1


def leaky_relu(x, slope: float = LRELU_SLOPE):
    return jnp.where(x >= 0, x, slope * x)



class _PolyphaseUp(nn.Module):
    """Param-compatible stand-in for nn.ConvTranspose(transpose_kernel=True)
    computing the stage via the polyphase einsum (see
    ops/packed_conv.PolyphaseConvTranspose). Same kernel [k, C_out, C_in] /
    bias [C_out] names and shapes — checkpoints swap in unchanged."""

    features: int
    kernel_size: int
    stride: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from diffnorm_tpu.ops.packed_conv import PolyphaseConvTranspose

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(batch_axis=(), in_axis=-1,
                                                   out_axis=-2),
            (self.kernel_size, self.features, x.shape[-1]))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return PolyphaseConvTranspose.apply(
            x, kernel, bias, self.stride, dtype=self.dtype)


class ResBlock(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Sequence[int] = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for j, d in enumerate(self.dilations):
            h = leaky_relu(x)
            pad = (self.kernel_size * d - d) // 2
            h = nn.Conv(
                self.channels, kernel_size=(self.kernel_size,),
                kernel_dilation=(d,), padding=[(pad, pad)], dtype=self.dtype,
                name=f"conv1_{j}",
            )(h)
            h = leaky_relu(h)
            pad1 = (self.kernel_size - 1) // 2
            h = nn.Conv(
                self.channels, kernel_size=(self.kernel_size,),
                padding=[(pad1, pad1)], dtype=self.dtype, name=f"conv2_{j}",
            )(h)
            x = x + h
        return x


class HifiGanGenerator(nn.Module):
    """x: [B, T, in_dim] -> waveform [B, T * prod(upsample_rates)].

    Small-channel stages (channels <= 64) run their MRF resblocks through
    the space-to-depth packed-matmul path (ops/packed_conv.py) by default —
    those stages are 75% of vocoder wall time at ~2% MXU utilization in the
    direct conv layout. DIFFNORM_PACKED_VOCODER=0 opts out; the parameter
    tree is identical either way (the packed path reads the ResBlock
    submodule params in place)."""

    in_dim: int = 128
    upsample_rates: Sequence[int] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    dtype: jnp.dtype = jnp.float32

    def _packed_resblocks(self, x, i, ch):
        from diffnorm_tpu.ops.packed_conv import (
            pack,
            packed_resblock,
            unpack,
        )

        from diffnorm_tpu.ops import packed_conv as _pc

        # static int8 (DIFFNORM_INT8_VOCODER + DIFFNORM_INT8_STATIC):
        # calibrated per-conv activation amaxes remove the max-abs pass
        # over the waveform-rate activations — the pass that made dynamic
        # int8 a 7% LOSS here (PERFORMANCE.md). Calibration mode
        # (DIFFNORM_INT8_CALIB, mutable=["quant_stats"]) records them.
        calib = _pc._INT8 and os.environ.get(
            "DIFFNORM_INT8_CALIB", "0") == "1"
        static = _pc._INT8 and os.environ.get(
            "DIFFNORM_INT8_STATIC", "0") == "1"

        p = 128 // ch
        t = x.shape[1]
        pad_t = (-t) % p
        if pad_t:
            x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        xp = pack(x, p)
        acc = None
        for j, (rk, rd) in enumerate(
            zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
        ):
            params = self.variables["params"][f"resblock_{i}_{j}"]
            name = f"packed_{i}_{j}"
            # STATIC-first like ops/quant.site_quantize: an already-
            # calibrated site keeps its scales and calibration mode is a
            # no-op for it (consistent recalibration semantics across the
            # int8 families)
            amaxes = None
            if static and self.has_variable("quant_stats", name):
                amaxes = self.get_variable("quant_stats", name)
            if amaxes is None and calib:
                r, observed = packed_resblock(
                    xp, params, rk, tuple(rd), p,
                    valid_len=t if pad_t else None, observe=True)
                n_conv = 2 * len(rd)
                v = self.variable(
                    "quant_stats", name,
                    lambda n=n_conv: jnp.zeros((n,), jnp.float32))
                v.value = jnp.maximum(v.value, observed)
            else:
                r = packed_resblock(xp, params, rk, tuple(rd), p,
                                    valid_len=t if pad_t else None,
                                    amaxes=amaxes)
            acc = r if acc is None else acc + r
        x = unpack(acc / len(self.resblock_kernel_sizes), p)
        return x[:, :t] if pad_t else x

    @nn.compact
    def __call__(self, x):
        use_packed = (
            os.environ.get("DIFFNORM_PACKED_VOCODER", "1") != "0"
            and not self.is_initializing()
        )
        x = nn.Conv(
            self.upsample_initial_channel, kernel_size=(7,), padding=[(3, 3)],
            dtype=self.dtype, name="conv_pre",
        )(x)
        for i, (u, k) in enumerate(
            zip(self.upsample_rates, self.upsample_kernel_sizes)
        ):
            x = leaky_relu(x)
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            if (os.environ.get("DIFFNORM_POLYPHASE", "0") == "1"
                    and not self.is_initializing()):
                # polyphase re-expression of the same stage: one einsum
                # with contraction M*C_in instead of XLA's conv-transpose
                # lowering (ops/packed_conv.PolyphaseConvTranspose; crop
                # folded in; identical param layout/names)
                x = _PolyphaseUp(
                    features=ch, kernel_size=k, stride=u,
                    dtype=self.dtype, name=f"up_{i}",
                )(x)
            else:
                # torch ConvTranspose1d(pad=(k-u)//2) trims (k-u) total
                # output frames; lax.conv_transpose with VALID then crop
                # matches exactly
                x = nn.ConvTranspose(
                    ch, kernel_size=(k,), strides=(u,), padding="VALID",
                    transpose_kernel=True, dtype=self.dtype, name=f"up_{i}",
                )(x)
                crop = (k - u) // 2
                if crop > 0:
                    x = x[:, crop:-crop]
            if use_packed and ch <= 64 and 128 % ch == 0:
                x = self._packed_resblocks(x, i, ch)
                continue
            acc = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = ResBlock(
                    ch, rk, tuple(rd), dtype=self.dtype,
                    name=f"resblock_{i}_{j}",
                )(x)
                acc = r if acc is None else acc + r
            x = acc / len(self.resblock_kernel_sizes)
        # reference hifigan.py:166 uses F.leaky_relu with the torch DEFAULT
        # slope (0.01) here, unlike the 0.1 used everywhere else
        x = leaky_relu(x, 0.01)
        x = nn.Conv(1, kernel_size=(7,), padding=[(3, 3)], dtype=self.dtype,
                    name="conv_post")(x)
        return jnp.tanh(x)[..., 0]


class VariancePredictor(nn.Module):
    """Duration predictor (fastspeech2.py:117-151)."""

    hidden_dim: int = 256
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) // 2
        h = nn.Conv(self.hidden_dim, kernel_size=(self.kernel_size,),
                    padding=[(pad, pad)], dtype=self.dtype, name="conv1")(x)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln1")(h)
        h = nn.Conv(self.hidden_dim, kernel_size=(self.kernel_size,),
                    padding=[(1, 1)], dtype=self.dtype, name="conv2")(h)
        h = nn.relu(h)
        h = nn.LayerNorm(dtype=self.dtype, name="ln2")(h)
        return nn.Dense(1, dtype=self.dtype, name="proj")(h)[..., 0]


class CodeGenerator(nn.Module):
    """Unit codes -> waveform. Duration expansion happens outside jit (ragged
    repeat_interleave); the generator itself is fully jitted."""

    num_embeddings: int = 1000
    embedding_dim: int = 128
    upsample_rates: Sequence[int] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    num_speakers: int = 0
    dur_predictor: bool = False
    var_pred_hidden_dim: int = 256
    var_pred_kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.dict_emb = nn.Embed(self.num_embeddings, self.embedding_dim,
                                 name="dict")
        in_dim = self.embedding_dim * (2 if self.num_speakers else 1)
        self.generator = HifiGanGenerator(
            in_dim=in_dim,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            upsample_initial_channel=self.upsample_initial_channel,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            dtype=self.dtype,
            name="generator",
        )
        if self.num_speakers:
            self.spkr_emb = nn.Embed(self.num_speakers, self.embedding_dim,
                                     name="spkr")
        if self.dur_predictor:
            self.duration_predictor = VariancePredictor(
                hidden_dim=self.var_pred_hidden_dim,
                kernel_size=self.var_pred_kernel_size,
                dtype=self.dtype, name="dur_predictor",
            )

    def log_durations(self, code):
        """Raw log-duration predictions [B, T] (training target:
        log(duration + 1))."""
        return self.duration_predictor(self.dict_emb(code))

    def predict_durations(self, code):
        """code: [B, T] -> int32 durations (>= 1), codehifigan.py:55-60."""
        log_dur = self.log_durations(code)
        return jnp.maximum(
            jnp.round(jnp.exp(log_dur) - 1.0).astype(jnp.int32), 1
        )

    def __call__(self, code, spkr=None):
        """code: [B, T] int32 (already duration-expanded if needed)."""
        x = self.dict_emb(code)
        if self.num_speakers:
            assert spkr is not None
            s = self.spkr_emb(spkr)[:, None, :]
            s = jnp.broadcast_to(s, x.shape)
            x = jnp.concatenate([x, s], axis=-1)
        return self.generator(x)


class FeatureGenerator(nn.Module):
    """Continuous-feature -> waveform generator (reference repr_to_speech /
    hubert_to_speech tasks, fairseq/tasks/repr_hifigan_task.py): the unit
    embedding table is replaced by a linear projection of e.g. 768-d mHuBERT
    features; the HiFi-GAN stack is unchanged."""

    feature_dim: int = 768
    embedding_dim: int = 128
    upsample_rates: Sequence[int] = (5, 4, 4, 2, 2)
    upsample_kernel_sizes: Sequence[int] = (11, 8, 8, 4, 4)
    upsample_initial_channel: int = 512
    resblock_kernel_sizes: Sequence[int] = (3, 7, 11)
    resblock_dilation_sizes: Sequence[Sequence[int]] = ((1, 3, 5),) * 3
    dur_predictor: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.proj = nn.Dense(self.embedding_dim, dtype=self.dtype, name="proj")
        self.generator = HifiGanGenerator(
            in_dim=self.embedding_dim,
            upsample_rates=self.upsample_rates,
            upsample_kernel_sizes=self.upsample_kernel_sizes,
            upsample_initial_channel=self.upsample_initial_channel,
            resblock_kernel_sizes=self.resblock_kernel_sizes,
            resblock_dilation_sizes=self.resblock_dilation_sizes,
            dtype=self.dtype,
            name="generator",
        )

    def __call__(self, features):
        """features: [B, T, feature_dim] -> waveform [B, T * upsample]."""
        return self.generator(self.proj(features))


class CodeHiFiGANVocoder:
    """Runtime wrapper (vocoder.py:214-243): config + converted weights."""

    def __init__(self, module: CodeGenerator, variables):
        self.module = module
        self.variables = variables
        self._wave_fn = jax.jit(
            lambda v, code: module.apply(v, code)
        )
        self._dur_fn = (
            jax.jit(lambda v, code: module.apply(
                v, code, method=CodeGenerator.predict_durations))
            if module.dur_predictor
            else None
        )

    @classmethod
    def from_config(cls, cfg: Dict, variables=None, rng=None):
        module = CodeGenerator(
            num_embeddings=cfg["num_embeddings"],
            embedding_dim=cfg["embedding_dim"],
            upsample_rates=tuple(cfg["upsample_rates"]),
            upsample_kernel_sizes=tuple(cfg["upsample_kernel_sizes"]),
            upsample_initial_channel=cfg["upsample_initial_channel"],
            resblock_kernel_sizes=tuple(cfg["resblock_kernel_sizes"]),
            resblock_dilation_sizes=tuple(
                tuple(d) for d in cfg["resblock_dilation_sizes"]
            ),
            num_speakers=cfg.get("num_speakers", 0) if cfg.get("multispkr") else 0,
            dur_predictor=bool(cfg.get("dur_predictor_params")),
            var_pred_hidden_dim=(cfg.get("dur_predictor_params") or {}).get(
                "var_pred_hidden_dim", 256
            ),
        )
        if variables is None:
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            code = jnp.zeros((1, 8), jnp.int32)

            def init_all(m, c):
                out = m(c)
                if m.dur_predictor:
                    m.predict_durations(c)
                return out

            variables = module.init(rng, code, method=init_all)
        return cls(module, variables)

    def __call__(self, units: np.ndarray, dur_prediction: bool = False,
                 reduce: bool = False) -> np.ndarray:
        """units: [T] int; returns waveform [T_wav] float32.
        Strips invalid (< 0) codes like the reference wrapper."""
        units = np.asarray(units)
        units = units[units >= 0]
        if reduce:
            from diffnorm_tpu.ops.unit_reduce import reduce_units

            units, _, _ = reduce_units(units)
        code = jnp.asarray(units, jnp.int32)[None, :]
        if dur_prediction:
            assert self._dur_fn is not None, "vocoder has no duration predictor"
            durs = np.asarray(self._dur_fn(self.variables, code))[0]
            units = np.repeat(np.asarray(units), durs)
            code = jnp.asarray(units, jnp.int32)[None, :]
        wav = self._wave_fn(self.variables, code)
        return np.asarray(wav[0])
