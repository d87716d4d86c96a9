"""Golden-value tests for the DDPM schedule math and LR schedules."""

import numpy as np

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.diffusion import DDPMSchedule, get_named_beta_schedule
from diffnorm_tpu.train.lr_schedules import build_lr_schedule


def test_cosine_schedule_golden():
    """Reference: get_named_beta_schedule('cosine', T)
    (latent_module.py:1199-1223) — betas_for_alpha_bar with
    alpha_bar(t) = cos((t+0.008)/1.008 * pi/2)^2, max_beta 0.999."""
    import math

    betas = get_named_beta_schedule("cosine", 200)
    assert betas.shape == (200,)

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    # independent recomputation at a few points
    for i in [0, 1, 57, 123, 199]:
        expected = min(1 - alpha_bar((i + 1) / 200) / alpha_bar(i / 200), 0.999)
        np.testing.assert_allclose(betas[i], expected, rtol=1e-12)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_schedule_tables_consistent():
    s = DDPMSchedule.create(200)
    np.testing.assert_allclose(
        s.alphas_cumprod, np.cumprod(1 - s.betas), rtol=1e-12
    )
    np.testing.assert_allclose(s.alphas_cumprod_prev[0], 1.0)
    np.testing.assert_allclose(
        s.alphas_cumprod_prev[1:], s.alphas_cumprod[:-1], rtol=1e-12
    )
    np.testing.assert_allclose(
        s.sqrt_alphas_cumprod ** 2 + s.sqrt_one_minus_alphas_cumprod ** 2,
        1.0,
        rtol=1e-6,
    )


def test_snr_monotone_decreasing():
    s = DDPMSchedule.create(200)
    import jax.numpy as jnp

    snr = np.asarray(s.snr(jnp.arange(200)))
    assert (np.diff(snr) < 0).all()


def test_inverse_sqrt_lr():
    cfg = Config(lr=5e-4, warmup_updates=10000, warmup_init_lr=1e-7,
                 lr_scheduler="inverse_sqrt")
    sched = build_lr_schedule(cfg)
    np.testing.assert_allclose(float(sched(0)), 1e-7, rtol=1e-5)
    np.testing.assert_allclose(float(sched(10000)), 5e-4, rtol=1e-4)
    np.testing.assert_allclose(float(sched(40000)), 5e-4 / 2, rtol=1e-4)
