"""Unit tests for shared layers: RMSNorm numerics, sinusoidal positions,
rel-shift, causal conv causality, GEGLU feedforward shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.models.conformer import rel_positional_encoding, rel_shift
from diffnorm_tpu.models.layers import (
    CausalConv1d,
    FeedForward,
    RMSNorm,
    sinusoidal_positions,
)


def test_rmsnorm_matches_l2_normalize():
    x = np.random.default_rng(0).normal(size=(2, 5, 8)).astype(np.float32)
    m = RMSNorm(dim=8)
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    expected = x / np.linalg.norm(x, axis=-1, keepdims=True) * np.sqrt(8)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5)


def test_adaptive_rmsnorm_film():
    x = np.ones((2, 3, 8), dtype=np.float32)
    cond = np.random.default_rng(0).normal(size=(2, 4)).astype(np.float32)
    m = RMSNorm(dim=8, scale=False, cond_dim=4)
    params = m.init(jax.random.PRNGKey(0), x, cond)
    out = m.apply(params, x, cond)
    assert out.shape == (2, 3, 8)


def test_sinusoidal_positions_padding_rows_zero():
    mask = np.array([[True, True, False], [True, False, False]])
    emb = sinusoidal_positions(mask, 16, padding_idx=0)
    assert emb.shape == (2, 3, 16)
    # padded positions must be exactly zero (fairseq padding_idx row)
    np.testing.assert_allclose(np.asarray(emb[0, 2]), 0.0)
    np.testing.assert_allclose(np.asarray(emb[1, 1:]), 0.0)
    # valid positions are 1-based cumsum -> first valid pos identical across rows
    np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(emb[1, 0]))


def test_causal_conv_is_causal():
    m = CausalConv1d(features=4, kernel_size=3, dilation=2)
    x = np.random.default_rng(0).normal(size=(1, 10, 4)).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    out1 = np.asarray(m.apply(params, x))
    x2 = x.copy()
    x2[0, 7:] = 99.0  # mutate the future
    out2 = np.asarray(m.apply(params, x2))
    np.testing.assert_allclose(out1[0, :7], out2[0, :7], rtol=1e-5)


def test_causal_conv_matches_lax_conv():
    """Shifted-matmul formulation == conv_general_dilated, including
    dilation >= sequence length (wavenet chains reach dilation 128)."""
    rng = np.random.default_rng(1)
    for t, d in [(10, 2), (8, 8), (6, 16)]:
        x = rng.normal(size=(2, t, 3)).astype(np.float32)
        m = CausalConv1d(features=5, kernel_size=3, dilation=d)
        params = m.init(jax.random.PRNGKey(0), x)
        out = np.asarray(m.apply(params, x))
        import jax.numpy as jnp
        from jax import lax

        kernel = np.asarray(params["params"]["kernel"])  # [k, in, out]
        bias = np.asarray(params["params"]["bias"])
        ref = lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(kernel),
            window_strides=(1,), padding=[(d * 2, 0)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        ) + bias
        np.testing.assert_allclose(out, np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_rel_shift_matches_gather():
    rng = np.random.default_rng(0)
    t = 6
    x = rng.normal(size=(2, 3, t, 2 * t - 1)).astype(np.float32)
    out = np.asarray(rel_shift(jnp.asarray(x)))
    # out[i, j] should equal x[i, j - i + t - 1]
    for i in range(t):
        for j in range(t):
            np.testing.assert_allclose(
                out[:, :, i, j], x[:, :, i, j - i + t - 1], rtol=1e-6
            )


def test_rel_positional_encoding_center_row():
    pe = rel_positional_encoding(5, 8)
    assert pe.shape == (9, 8)
    # center row (relative position 0): sin(0)=0, cos(0)=1
    np.testing.assert_allclose(pe[4, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(pe[4, 1::2], 1.0, atol=1e-6)


def test_feedforward_inner_dim():
    m = FeedForward(dim=12, mult=4, causal_conv=True)
    x = np.zeros((2, 5, 12), dtype=np.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    # dim_inner = int(12 * 4 * 2/3) = 32
    assert params["params"]["proj_in"]["kernel"].shape == (12, 64)
    out = m.apply(params, x)
    assert out.shape == (2, 5, 12)

