"""Packed (space-to-depth) small-channel vocoder path: exact parity with
the direct ResBlock convs, full-generator parity, and op-level checks."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from diffnorm_tpu.models.hifigan import HifiGanGenerator, ResBlock
from diffnorm_tpu.ops.packed_conv import (
    pack,
    packed_resblock,
    packed_same_conv,
    unpack,
)


def test_pack_unpack_roundtrip():
    x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
    assert jnp.array_equal(unpack(pack(x, 8), 8), x)


@pytest.mark.parametrize("k,d,c,p", [(3, 1, 16, 8), (7, 3, 32, 4),
                                     (11, 5, 16, 8), (3, 5, 64, 2)])
def test_packed_same_conv_matches_direct(k, d, c, p):
    rng = np.random.default_rng(0)
    b, t = 2, 40
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(k, c, c)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)

    pad = (k * d - d) // 2
    direct = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,), padding=[(pad, pad)],
        rhs_dilation=(d,), dimension_numbers=("NWC", "WIO", "NWC"),
    ) + bias
    out = unpack(packed_same_conv(pack(x, p), kernel, bias, p, d), p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(direct),
                               rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,dil,c,p", [(3, (1, 3, 5), 16, 8),
                                       (7, (1, 3, 5), 32, 4)])
def test_packed_resblock_matches_module(k, dil, c, p):
    rng = np.random.default_rng(1)
    b, t = 2, 48
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    block = ResBlock(c, k, dil)
    variables = block.init(jax.random.PRNGKey(0), x)
    ref = block.apply(variables, x)
    out = unpack(
        packed_resblock(pack(x, p), variables["params"], k, dil, p), p
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generator_packed_path_matches_direct(monkeypatch):
    gen = HifiGanGenerator(
        in_dim=8, upsample_rates=(4, 2, 2), upsample_kernel_sizes=(8, 4, 4),
        upsample_initial_channel=64,  # stages: 32, 16, 8ch (8 not packable)
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3),) * 2,
    )
    x = jnp.asarray(
        np.random.default_rng(2).normal(size=(2, 10, 8)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("DIFFNORM_PACKED_VOCODER", "0")
    ref = gen.apply(variables, x)
    monkeypatch.setenv("DIFFNORM_PACKED_VOCODER", "1")
    out = gen.apply(variables, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_generator_packed_handles_non_divisible_length(monkeypatch):
    gen = HifiGanGenerator(
        in_dim=4, upsample_rates=(3,), upsample_kernel_sizes=(7,),
        upsample_initial_channel=32,  # one 16-ch stage, T=3*7=21 (pad to 24)
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
    )
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(1, 7, 4)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x)
    monkeypatch.setenv("DIFFNORM_PACKED_VOCODER", "0")
    ref = gen.apply(variables, x)
    monkeypatch.setenv("DIFFNORM_PACKED_VOCODER", "1")
    out = gen.apply(variables, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_packed_same_conv_int8_parity():
    """int8 W8A8 packed conv (DIFFNORM_INT8_VOCODER): one per-tensor kernel
    scale is EXACT across the W_s placements (they all gather the same
    [k,C,C] values), so the int32-accumulated path must match the explicit
    quantize->float math bit-for-bit, and the float path within the ~1%
    int8 quantization error."""
    rng = np.random.default_rng(7)
    c, p, k, d = 16, 8, 3, 2
    x = rng.normal(size=(2, 64, c)).astype(np.float32)
    kernel = rng.normal(size=(k, c, c)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c,)).astype(np.float32) * 0.05
    xp = pack(jnp.asarray(x), p)

    ref = np.asarray(packed_same_conv(xp, jnp.asarray(kernel),
                                      jnp.asarray(bias), p, d, quant=False))
    q = np.asarray(packed_same_conv(xp, jnp.asarray(kernel),
                                    jnp.asarray(bias), p, d, quant=True))
    # explicit oracle: quantize both sides per-tensor, run the FLOAT packed
    # conv on the dequantized tensors — equals the int32 path exactly
    ks = np.abs(kernel).max() / 127.0
    as_ = np.abs(x).max() / 127.0
    kq = np.round(kernel / ks) * ks
    xq = np.round(x / as_) * as_
    oracle = np.asarray(packed_same_conv(
        pack(jnp.asarray(xq.astype(np.float32)), p),
        jnp.asarray(kq.astype(np.float32)), jnp.asarray(bias), p, d,
        quant=False))
    np.testing.assert_allclose(q, oracle, rtol=1e-5, atol=1e-5)
    # quantization error bound vs the float path
    denom = np.abs(ref).max()
    assert np.abs(q - ref).max() / denom < 0.02


def test_packed_vocoder_static_int8_parity(monkeypatch):
    """Static calibrated scales on the packed int8 vocoder convs
    (DIFFNORM_INT8_VOCODER + DIFFNORM_INT8_STATIC): calibrate with a
    mutable apply, then the static synthesis must track the float path
    within the dynamic-int8 bound."""
    from diffnorm_tpu.models.hifigan import HifiGanGenerator
    from diffnorm_tpu.ops import packed_conv
    from diffnorm_tpu.ops.quant import calibrate_apply

    gen = HifiGanGenerator(
        upsample_rates=(4, 2), upsample_kernel_sizes=(8, 4),
        upsample_initial_channel=64, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),),
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 40, 16)), jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(gen.apply(variables, x))

    monkeypatch.setattr(packed_conv, "_INT8", True)
    dyn = np.asarray(gen.apply(variables, x))
    v_cal = calibrate_apply(gen.apply, variables, x)
    assert "quant_stats" in v_cal
    monkeypatch.setenv("DIFFNORM_INT8_STATIC", "1")
    stat = np.asarray(gen.apply(v_cal, x))
    monkeypatch.delenv("DIFFNORM_INT8_STATIC")

    def rel(a, b):
        return float(np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-9))

    assert rel(dyn, ref) < 0.05
    # calibrated on the same batch, the static path sees exact amaxes —
    # stays within ~the dynamic error
    assert rel(stat, ref) < 0.06

    # the static path must actually CONSUME quant_stats (review regression:
    # a silent dynamic fallback also passes the bounds above). Perturbing
    # the recorded amaxes must change the output; the fallback wouldn't.
    import jax as _jax

    monkeypatch.setenv("DIFFNORM_INT8_STATIC", "1")
    v_bad = {**v_cal, "quant_stats": _jax.tree_util.tree_map(
        lambda a: a * 7.0, v_cal["quant_stats"])}
    stat_bad = np.asarray(gen.apply(v_bad, x))
    monkeypatch.delenv("DIFFNORM_INT8_STATIC")
    assert np.abs(stat_bad - stat).max() > 1e-5

    # and with STATIC set, re-calibration is a no-op for calibrated sites
    # (site_quantize-consistent precedence)
    monkeypatch.setenv("DIFFNORM_INT8_STATIC", "1")
    v_re = calibrate_apply(gen.apply, v_bad, x)
    monkeypatch.delenv("DIFFNORM_INT8_STATIC")
    np.testing.assert_array_equal(
        np.asarray(jax.tree_util.tree_leaves(v_re["quant_stats"])[0]),
        np.asarray(jax.tree_util.tree_leaves(v_bad["quant_stats"])[0]))


def test_polyphase_conv_transpose_matches_flax():
    """PolyphaseConvTranspose == nn.ConvTranspose(transpose_kernel=True,
    VALID) + (k-u)//2 crop, for every (k, u) the released vocoders use
    (hifigan.py upsample stacks), including u that doesn't divide k."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from diffnorm_tpu.ops.packed_conv import PolyphaseConvTranspose

    rng = np.random.default_rng(0)
    for (k, u, ci, co, t) in [(11, 5, 6, 4, 13), (8, 4, 4, 8, 10),
                              (4, 2, 8, 4, 9), (16, 8, 5, 3, 7),
                              (20, 10, 3, 2, 5)]:
        x = jnp.asarray(rng.normal(size=(2, t, ci)), jnp.float32)
        layer = nn.ConvTranspose(co, kernel_size=(k,), strides=(u,),
                                 padding="VALID", transpose_kernel=True)
        variables = layer.init(jax.random.PRNGKey(0), x)
        ref = layer.apply(variables, x)
        crop = (k - u) // 2
        if crop > 0:
            ref = ref[:, crop:-crop]
        got = PolyphaseConvTranspose.apply(
            x, variables["params"]["kernel"], variables["params"]["bias"], u)
        assert got.shape == ref.shape, (k, u, got.shape, ref.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5), (k, u)


def test_polyphase_generator_end_to_end():
    """DIFFNORM_POLYPHASE=1 swaps every upsample stage at identical params:
    full HifiGanGenerator outputs agree with the conv-transpose path."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffnorm_tpu.models.hifigan import HifiGanGenerator

    gen = HifiGanGenerator(
        in_dim=8, upsample_rates=(5, 4), upsample_kernel_sizes=(11, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 2),))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 12, 8)),
                    jnp.float32)
    variables = gen.init(jax.random.PRNGKey(0), x)
    old = os.environ.get("DIFFNORM_POLYPHASE")
    try:
        os.environ["DIFFNORM_POLYPHASE"] = "0"
        ref = gen.apply(variables, x)
        os.environ["DIFFNORM_POLYPHASE"] = "1"
        got = gen.apply(variables, x)
    finally:
        if old is None:
            os.environ.pop("DIFFNORM_POLYPHASE", None)
        else:
            os.environ["DIFFNORM_POLYPHASE"] = old
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-5, atol=3e-5)
