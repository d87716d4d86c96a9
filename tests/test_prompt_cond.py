"""Prompt-conditioned denoiser: PerceiverResampler, CFG null swap,
forward_with_cond_scale."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.models.diffusion import Denoiser, PerceiverResampler


def test_perceiver_resampler_shapes():
    m = PerceiverResampler(dim=16, depth=1, dim_context=24, num_latents=4,
                           dim_head=8, heads=2)
    prompt = jnp.asarray(np.random.default_rng(0).normal(size=(2, 7, 24)),
                         jnp.float32)
    mask = jnp.asarray([[True] * 7, [True] * 3 + [False] * 4])
    variables = m.init(jax.random.PRNGKey(0), prompt, mask)
    out = m.apply(variables, prompt, mask)
    assert out.shape == (2, 4, 16)


@pytest.fixture(scope="module")
def cond_denoiser():
    den = Denoiser(dim=16, latent_dim=3, depth=1, dim_head=8, heads=2,
                   wavenet_layers=2, wavenet_stacks=1,
                   condition_on_prompt=True, dim_prompt=24, num_latents_m=4,
                   resampler_depth=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 3)), jnp.float32)
    t = jnp.asarray([3.0, 7.0])
    prompt = jnp.asarray(rng.normal(size=(2, 5, 24)), jnp.float32)
    variables = den.init(
        {"params": jax.random.PRNGKey(0)}, x, t, prompt=prompt,
        cond_drop_prob=0.0,
    )
    return den, variables, x, t, prompt


def test_cond_denoiser_forward(cond_denoiser):
    den, variables, x, t, prompt = cond_denoiser
    out = den.apply(variables, x, t, prompt=prompt, cond_drop_prob=0.0)
    assert out.shape == x.shape
    # full-drop uses the null embeddings and must differ from conditioned
    out_null = den.apply(variables, x, t, prompt=prompt, cond_drop_prob=1.0)
    assert not np.allclose(np.asarray(out), np.asarray(out_null))
    # null output is independent of the prompt content
    out_null2 = den.apply(variables, x, t, prompt=prompt * 3.0,
                          cond_drop_prob=1.0)
    np.testing.assert_allclose(np.asarray(out_null), np.asarray(out_null2),
                               rtol=1e-5)


def test_forward_with_cond_scale(cond_denoiser):
    den, variables, x, t, prompt = cond_denoiser
    cond = den.apply(variables, x, t, prompt=prompt, cond_drop_prob=0.0)
    null = den.apply(variables, x, t, prompt=prompt, cond_drop_prob=1.0)
    scaled = den.apply(
        variables, x, t, prompt=prompt, cond_scale=2.0,
        method=Denoiser.forward_with_cond_scale,
    )
    expected = np.asarray(null) + (np.asarray(cond) - np.asarray(null)) * 2.0
    np.testing.assert_allclose(np.asarray(scaled), expected, rtol=1e-4,
                               atol=1e-5)
