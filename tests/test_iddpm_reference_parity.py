"""IDDPM toolkit parity against the REAL vendored improved-diffusion port.

Loads /root/reference/fairseq/models/text_to_speech/diffusion/
{diffusion_utils, gaussian_diffusion, respace}.py VERBATIM and checks our
models/gaussian_diffusion.py on shared inputs: beta schedules, respacing,
q_sample / posterior identities, p_mean_variance for every mean x var
combination, training losses (mse / rescaled_mse / rescaled_kl incl. the
t==0 discretized-Gaussian decoder-NLL branch), DDIM forward/reverse steps,
and the prior bpd. x is kept 2-D [B, C] so the reference's channel-dim
split (dim=1) and ours (axis=-1) address the same axis.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from reference_loader import load_iddpm  # noqa: E402

from diffnorm_tpu.models.diffusion import get_named_beta_schedule  # noqa: E402
from diffnorm_tpu.models.gaussian_diffusion import (  # noqa: E402
    GaussianDiffusion,
    space_timesteps,
)

B, C = 4, 6
STEPS = 40


def _ref_gd(gd_mod, betas, mean="eps", var="learned_range", loss="mse"):
    mt = {"eps": gd_mod.ModelMeanType.EPSILON,
          "x_start": gd_mod.ModelMeanType.START_X,
          "prev_x": gd_mod.ModelMeanType.PREVIOUS_X}[mean]
    vt = {"learned_range": gd_mod.ModelVarType.LEARNED_RANGE,
          "fixed_small": gd_mod.ModelVarType.FIXED_SMALL,
          "fixed_large": gd_mod.ModelVarType.FIXED_LARGE}[var]
    lt = {"mse": gd_mod.LossType.MSE,
          "rescaled_mse": gd_mod.LossType.RESCALED_MSE,
          "kl": gd_mod.LossType.KL,
          "rescaled_kl": gd_mod.LossType.RESCALED_KL}[loss]
    return gd_mod.GaussianDiffusion(
        betas=betas, model_mean_type=mt, model_var_type=vt, loss_type=lt
    )


def _inputs(seed=0, learned=True):
    r = np.random.default_rng(seed)
    x0 = r.normal(size=(B, C)).astype(np.float32) * 0.5
    noise = r.normal(size=(B, C)).astype(np.float32)
    out = r.normal(size=(B, 2 * C if learned else C)).astype(np.float32) * 0.3
    t = np.array([0, 1, STEPS // 2, STEPS - 1], np.int64)  # includes t == 0
    return x0, noise, out, t


def _ref_betas(gd_mod, name, steps):
    # the vendored IDDPM file spells cosine "squaredcos_cap_v2"
    return gd_mod.get_named_beta_schedule(
        {"cosine": "squaredcos_cap_v2"}.get(name, name), steps
    )


def test_beta_schedules_match_reference():
    gd_mod, _ = load_iddpm()
    for name in ("linear", "cosine"):
        ref = _ref_betas(gd_mod, name, STEPS)
        ours = get_named_beta_schedule(name, STEPS)
        np.testing.assert_allclose(ours, ref, rtol=1e-12)


def test_space_timesteps_matches_reference():
    _, respace = load_iddpm()
    for spec in ("10", "ddim10", "5,7,8", ""):
        spec_ref = spec if spec else [STEPS]
        ref = sorted(respace.space_timesteps(STEPS, spec_ref))
        assert sorted(space_timesteps(STEPS, spec)) == ref


def test_respaced_tables_match_reference():
    gd_mod, respace = load_iddpm()
    betas = _ref_betas(gd_mod, "cosine", STEPS)
    ref = respace.SpacedDiffusion(
        use_timesteps=respace.space_timesteps(STEPS, "10"), betas=betas,
        model_mean_type=gd_mod.ModelMeanType.EPSILON,
        model_var_type=gd_mod.ModelVarType.FIXED_SMALL,
        loss_type=gd_mod.LossType.MSE,
    )
    ours = GaussianDiffusion.create(STEPS, "cosine", timestep_respacing="10")
    np.testing.assert_allclose(ours.betas, ref.betas, rtol=1e-12)
    np.testing.assert_array_equal(ours.timestep_map, ref.timestep_map)
    for name_ours, name_ref in [
        ("alphas_cumprod", "alphas_cumprod"),
        ("posterior_variance", "posterior_variance"),
        ("posterior_log_variance_clipped", "posterior_log_variance_clipped"),
        ("posterior_mean_coef1", "posterior_mean_coef1"),
        ("posterior_mean_coef2", "posterior_mean_coef2"),
    ]:
        np.testing.assert_allclose(
            getattr(ours, name_ours), getattr(ref, name_ref), rtol=1e-10
        )


def test_q_sample_and_posterior_match_reference():
    gd_mod, _ = load_iddpm()
    betas = _ref_betas(gd_mod, "cosine", STEPS)
    ref = _ref_gd(gd_mod, betas)
    ours = GaussianDiffusion(betas)
    x0, noise, _, t = _inputs()
    x0_t, noise_t, t_t = map(torch.from_numpy, (x0, noise, t))

    ref_xt = ref.q_sample(x0_t, t_t, noise=noise_t)
    our_xt = ours.q_sample(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(our_xt), ref_xt.numpy(), rtol=1e-5)

    rm, rv, rlv = ref.q_posterior_mean_variance(x0_t, ref_xt, t_t)
    om, ov, olv = ours.q_posterior(jnp.asarray(x0), our_xt, jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(om), rm.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ov)[:, 0], rv.numpy()[:, 0], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(olv)[:, 0], rlv.numpy()[:, 0],
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("var", ["learned_range", "fixed_small", "fixed_large"])
@pytest.mark.parametrize("mean", ["eps", "x_start"])
@pytest.mark.parametrize("clip", [False, True])
def test_p_mean_variance_matches_reference(var, mean, clip):
    gd_mod, _ = load_iddpm()
    betas = _ref_betas(gd_mod, "linear", STEPS)
    ref = _ref_gd(gd_mod, betas, mean=mean, var=var)
    ours = GaussianDiffusion(betas)
    x0, _, out, t = _inputs(1, learned=(var == "learned_range"))

    ref_out = ref.p_mean_variance(
        lambda x, tt: torch.from_numpy(out), torch.from_numpy(x0),
        torch.from_numpy(t), clip_denoised=clip,
    )
    om, ovar, olog, ox0 = ours.p_mean_variance(
        jnp.asarray(out), jnp.asarray(x0), jnp.asarray(t),
        model_mean_type=mean, model_var_type=var, clip_x0=clip,
    )
    np.testing.assert_allclose(np.asarray(om), ref_out["mean"].numpy(),
                               rtol=1e-4, atol=1e-5)
    # ours keeps fixed variances as broadcastable [B, 1] tables
    np.testing.assert_allclose(
        np.broadcast_to(np.asarray(olog), x0.shape),
        ref_out["log_variance"].numpy(), rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(ox0), ref_out["pred_xstart"].numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("loss", ["mse", "rescaled_mse", "rescaled_kl"])
def test_training_losses_match_reference(loss):
    gd_mod, _ = load_iddpm()
    betas = _ref_betas(gd_mod, "cosine", STEPS)
    ref = _ref_gd(gd_mod, betas, loss=loss)
    ours = GaussianDiffusion(betas)
    x0, noise, out, t = _inputs(2)

    if loss in ("mse", "rescaled_mse"):
        # the reference MSE branch unpacks model() as (output, misc)
        ref_model = lambda x, tt, **kw: (torch.from_numpy(out), None)  # noqa: E731
    else:
        # the KL branch goes through p_mean_variance (plain tensor)
        ref_model = lambda x, tt, **kw: torch.from_numpy(out)  # noqa: E731
    ref_terms = ref.training_losses(
        ref_model, torch.from_numpy(x0), torch.from_numpy(t),
        noise=torch.from_numpy(noise),
    )
    our_terms, _ = ours.training_losses(
        lambda x, tt: jnp.asarray(out), jnp.asarray(x0), jnp.asarray(t),
        rng=None, loss_type=loss, noise=jnp.asarray(noise),
    )
    for k in ("mse", "vb", "loss"):
        if k in ref_terms:
            np.testing.assert_allclose(
                np.asarray(our_terms[k]), ref_terms[k].numpy(),
                rtol=2e-4, atol=1e-5, err_msg=f"{loss}:{k}",
            )


def test_ddim_steps_match_reference():
    gd_mod, _ = load_iddpm()
    betas = _ref_betas(gd_mod, "linear", STEPS)
    ref = _ref_gd(gd_mod, betas, var="fixed_small")
    ours = GaussianDiffusion(betas)
    x0, noise, out, t = _inputs(3, learned=False)

    real_randn_like = torch.randn_like
    try:
        torch.randn_like = lambda x, **k: torch.from_numpy(noise)
        ref_fwd = ref.ddim_sample(
            lambda x, tt: torch.from_numpy(out), torch.from_numpy(x0),
            torch.from_numpy(t), clip_denoised=False, eta=0.3,
        )
    finally:
        torch.randn_like = real_randn_like
    our_fwd, our_x0 = ours.ddim_step(
        jnp.asarray(out), jnp.asarray(x0), jnp.asarray(t),
        jnp.asarray(noise), eta=0.3,
    )
    np.testing.assert_allclose(np.asarray(our_fwd), ref_fwd["sample"].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(our_x0),
                               ref_fwd["pred_xstart"].numpy(),
                               rtol=1e-4, atol=1e-5)

    ref_rev = ref.ddim_reverse_sample(
        lambda x, tt: torch.from_numpy(out), torch.from_numpy(x0),
        torch.from_numpy(t), clip_denoised=False,
    )
    our_rev = ours.ddim_reverse_step(
        jnp.asarray(out), jnp.asarray(x0), jnp.asarray(t)
    )
    np.testing.assert_allclose(np.asarray(our_rev), ref_rev["sample"].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_prior_bpd_matches_reference():
    gd_mod, _ = load_iddpm()
    betas = _ref_betas(gd_mod, "cosine", STEPS)
    ref = _ref_gd(gd_mod, betas)
    ours = GaussianDiffusion(betas)
    x0, _, _, _ = _inputs(4)
    ref_bpd = ref._prior_bpd(torch.from_numpy(x0))
    np.testing.assert_allclose(
        np.asarray(ours.prior_bpd(jnp.asarray(x0))), ref_bpd.numpy(),
        rtol=1e-4, atol=1e-6,
    )
