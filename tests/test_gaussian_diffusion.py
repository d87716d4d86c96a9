"""IDDPM toolkit: respacing, posterior identities, learned-sigma VLB,
sampling loop."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.models.gaussian_diffusion import (
    GaussianDiffusion,
    create_diffusion,
    space_timesteps,
)


def test_space_timesteps():
    assert space_timesteps(100, "10") == [0, 11, 22, 33, 44, 55, 66, 77, 88, 99]
    ddim = space_timesteps(100, "ddim25")
    assert len(ddim) == 25 and ddim[1] - ddim[0] == 4
    assert space_timesteps(10, "") == list(range(10))


def test_respaced_alphas_consistent():
    full = GaussianDiffusion.create(100, "cosine")
    spaced = GaussianDiffusion.create(100, "cosine", timestep_respacing="10")
    # cumulative alphas of retained steps must match the full schedule
    keep = spaced.timestep_map
    np.testing.assert_allclose(
        spaced.alphas_cumprod, full.alphas_cumprod[keep], rtol=1e-10
    )


def test_posterior_q_identity():
    gd = GaussianDiffusion.create(50, "cosine")
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.normal(rng, (2, 4, 3))
    t = jnp.asarray([10, 30])
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    x_t = gd.q_sample(x0, t, noise)
    # eps-prediction of the true noise recovers x0 exactly
    x0_rec = gd.predict_x0_from_eps(x_t, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0),
                               rtol=1e-4, atol=1e-5)


def test_training_losses_learned_sigma():
    gd, cfg = create_diffusion(diffusion_steps=20, learn_sigma=True)
    assert cfg["model_var_type"] == "learned_range"

    def denoise_fn(x, t):
        return jnp.concatenate([x * 0.1, jnp.zeros_like(x)], axis=-1)

    x0 = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 3))
    t = jnp.asarray([3, 15])
    losses, x_t = gd.training_losses(
        denoise_fn, x0, t, jax.random.PRNGKey(1), **cfg
    )
    assert np.isfinite(np.asarray(losses["loss"])).all()
    assert "vb" in losses and "mse" in losses
    # reference training_losses returns mean-flattened [N] terms
    assert losses["mse"].shape == (2,) and losses["vb"].shape == (2,)


def test_p_sample_loop_shapes():
    gd, cfg = create_diffusion(diffusion_steps=100, learn_sigma=False,
                               timestep_respacing="5")
    assert gd.num_timesteps == 5

    def denoise_fn(x, t):
        return x * 0.0  # predict zero noise

    out = gd.p_sample_loop(
        denoise_fn, (2, 4, 3), jax.random.PRNGKey(0),
        model_var_type=cfg["model_var_type"],
    )
    assert out.shape == (2, 4, 3)
    assert np.isfinite(np.asarray(out)).all()
    # respaced step indices map back into the original schedule
    mapped = np.asarray(gd.map_t(jnp.arange(5)))
    assert mapped.max() > 5  # original-schedule (0..99) indices
