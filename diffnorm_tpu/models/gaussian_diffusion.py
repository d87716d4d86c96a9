"""Full improved-DDPM (IDDPM) toolkit: learned-sigma posteriors, VLB terms,
timestep respacing.

Capability parity with the reference's vendored improved-diffusion port
(fairseq/models/text_to_speech/diffusion/gaussian_diffusion.py (872),
respace.py (129), diffusion/__init__.py:create_diffusion :10-46,
diffusion_utils.py) which the continuous ddpm criterions import. TPU
redesign: every table is a static numpy array closed over by jit; the
sampling loops are lax.scan bodies; respacing just re-derives the beta
tables for the retained timestep subset.

Supported knobs (create_diffusion parity):
* model_mean_type: 'eps' | 'x_start' | 'prev_x'
* model_var_type:  'fixed_small' | 'fixed_large' | 'learned_range'
* loss_type:       'mse' | 'rescaled_mse' | 'kl' (VLB)
* timestep_respacing: e.g. "" (all), "50", "ddim25"
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.models.diffusion import get_named_beta_schedule


def space_timesteps(num_timesteps: int, section_counts) -> list:
    """Respacing subset (reference respace.py:space_timesteps): "ddimN" uses
    a fixed stride; "a,b,c" splits into sections with those counts."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired:
                    return list(range(0, num_timesteps, i))
            raise ValueError(f"cannot create exactly {desired} ddim steps")
        section_counts = [int(x) for x in section_counts.split(",")] \
            if section_counts else [num_timesteps]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    result, start = [], 0
    for i, count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if count > size:
            raise ValueError(f"cannot divide section of {size} into {count}")
        stride = 1 if count <= 1 else (size - 1) / (count - 1)
        cur = 0.0
        for _ in range(count):
            result.append(start + round(cur))
            cur += stride
        start += size
    return result


def _ext(arr, t, ndim):
    vals = jnp.asarray(arr, jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


def mean_flat(x):
    """Mean over all non-batch dims (reference gaussian_diffusion.py:16)."""
    return jnp.mean(x, axis=tuple(range(1, x.ndim)))


def approx_standard_normal_cdf(x):
    """Tanh approximation of the standard normal CDF (reference
    diffusion_utils.py:39-44)."""
    return 0.5 * (
        1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to 1/255 image bins
    (reference diffusion_utils.py:62-89); x assumed rescaled to [-1, 1]."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.maximum(cdf_plus, 1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.maximum(1.0 - cdf_min, 1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(x > 0.999, log_one_minus_cdf_min,
                  jnp.log(jnp.maximum(cdf_delta, 1e-12))),
    )


@dataclasses.dataclass(frozen=True)
class GaussianDiffusion:
    betas: np.ndarray
    # respacing: original timestep index for each retained step (or None)
    timestep_map: Optional[np.ndarray] = None

    # ------------------------------------------------------------ tables --
    def __post_init__(self):
        betas = np.asarray(self.betas, np.float64)
        alphas = 1.0 - betas
        ac = np.cumprod(alphas)
        acp = np.append(1.0, ac[:-1])
        object.__setattr__(self, "alphas_cumprod", ac)
        object.__setattr__(self, "alphas_cumprod_prev", acp)
        object.__setattr__(self, "sqrt_ac", np.sqrt(ac))
        object.__setattr__(self, "sqrt_1mac", np.sqrt(1 - ac))
        object.__setattr__(self, "sqrt_recip_ac", np.sqrt(1.0 / ac))
        object.__setattr__(self, "sqrt_recipm1_ac", np.sqrt(1.0 / ac - 1))
        post_var = betas * (1.0 - acp) / (1.0 - ac)
        object.__setattr__(self, "posterior_variance", post_var)
        object.__setattr__(
            self, "posterior_log_variance_clipped",
            np.log(np.append(post_var[1], post_var[1:])),
        )
        object.__setattr__(
            self, "posterior_mean_coef1", betas * np.sqrt(acp) / (1.0 - ac)
        )
        object.__setattr__(
            self, "posterior_mean_coef2",
            (1.0 - acp) * np.sqrt(alphas) / (1.0 - ac),
        )

    @classmethod
    def create(cls, timesteps: int = 1000, schedule: str = "cosine",
               timestep_respacing: str = "") -> "GaussianDiffusion":
        betas = get_named_beta_schedule(schedule, timesteps)
        if timestep_respacing:
            use = sorted(space_timesteps(timesteps, timestep_respacing))
            ac = np.cumprod(1.0 - betas)
            last = 1.0
            new_betas = []
            for t in use:
                new_betas.append(1.0 - ac[t] / last)
                last = ac[t]
            return cls(np.asarray(new_betas), timestep_map=np.asarray(use))
        return cls(betas)

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def map_t(self, t):
        """Respaced step index -> original model timestep."""
        if self.timestep_map is None:
            return t
        return jnp.asarray(self.timestep_map, jnp.int32)[t]

    # ------------------------------------------------------- forward q ----
    def q_sample(self, x0, t, noise):
        return _ext(self.sqrt_ac, t, x0.ndim) * x0 + \
            _ext(self.sqrt_1mac, t, x0.ndim) * noise

    def q_posterior(self, x0, x_t, t):
        mean = (_ext(self.posterior_mean_coef1, t, x0.ndim) * x0
                + _ext(self.posterior_mean_coef2, t, x0.ndim) * x_t)
        var = _ext(self.posterior_variance, t, x0.ndim)
        logvar = _ext(self.posterior_log_variance_clipped, t, x0.ndim)
        return mean, var, logvar

    def predict_x0_from_eps(self, x_t, t, eps):
        return (_ext(self.sqrt_recip_ac, t, x_t.ndim) * x_t
                - _ext(self.sqrt_recipm1_ac, t, x_t.ndim) * eps)

    def predict_eps_from_x0(self, x_t, t, pred_x0):
        """Reference _predict_eps_from_xstart :341-344."""
        return (_ext(self.sqrt_recip_ac, t, x_t.ndim) * x_t - pred_x0) \
            / _ext(self.sqrt_recipm1_ac, t, x_t.ndim)

    # ----------------------------------------------------- reverse p ------
    def p_mean_variance(self, model_out, x_t, t,
                        model_mean_type: str = "eps",
                        model_var_type: str = "fixed_small",
                        clip_x0: bool = False):
        """model_out: [..., C] or [..., 2C] when learned_range."""
        c = x_t.shape[-1]
        if model_var_type == "learned_range":
            model_out, var_frac = jnp.split(model_out, 2, axis=-1)
            min_log = _ext(self.posterior_log_variance_clipped, t, x_t.ndim)
            max_log = jnp.log(jnp.maximum(_ext(self.betas, t, x_t.ndim), 1e-20))
            frac = (var_frac + 1.0) / 2.0
            model_logvar = frac * max_log + (1 - frac) * min_log
            model_var = jnp.exp(model_logvar)
        elif model_var_type == "fixed_large":
            model_var = _ext(np.append(self.posterior_variance[1], self.betas[1:]),
                             t, x_t.ndim)
            model_logvar = jnp.log(jnp.maximum(model_var, 1e-20))
        else:  # fixed_small
            model_var = _ext(self.posterior_variance, t, x_t.ndim)
            model_logvar = _ext(self.posterior_log_variance_clipped, t, x_t.ndim)

        if model_mean_type == "eps":
            x0 = self.predict_x0_from_eps(x_t, t, model_out)
        elif model_mean_type == "x_start":
            x0 = model_out
        else:  # prev_x: model predicts the posterior mean directly
            x0 = None
        if x0 is not None:
            if clip_x0:
                x0 = jnp.clip(x0, -1.0, 1.0)
            mean, _, _ = self.q_posterior(x0, x_t, t)
        else:
            mean = model_out
            x0 = jnp.zeros_like(x_t)
        return mean, model_var, model_logvar, x0

    # ----------------------------------------------------------- VLB ------
    def vb_term(self, model_out, x0, x_t, t,
                model_mean_type: str = "eps",
                model_var_type: str = "learned_range",
                clip_x0: bool = False,
                freeze_mean: bool = True):
        """Variational-bound term in bits, shape [N] (reference
    _vb_terms_bpd :682-713): mean-flattened KL(q(x_{t-1}|x_t,x0) ||
        p(x_{t-1}|x_t)) everywhere except t == 0, where it is the
        discretized-Gaussian decoder NLL of x0 under the model posterior.
        With freeze_mean (the training_losses path) the mean head is
        stop-gradiented so the VLB only trains the variance head."""
        true_mean, _, true_logvar = self.q_posterior(x0, x_t, t)
        if freeze_mean and model_var_type == "learned_range":
            mean_part, var_part = jnp.split(model_out, 2, axis=-1)
            frozen = jnp.concatenate(
                [jax.lax.stop_gradient(mean_part), var_part], axis=-1
            )
        else:
            frozen = model_out
        mean, _, logvar, _ = self.p_mean_variance(
            frozen, x_t, t, model_mean_type, model_var_type, clip_x0
        )
        kl = 0.5 * (
            -1.0 + logvar - true_logvar + jnp.exp(true_logvar - logvar)
            + jnp.square(true_mean - mean) * jnp.exp(-logvar)
        )
        kl = mean_flat(kl) / math.log(2.0)
        decoder_nll = -discretized_gaussian_log_likelihood(
            x0, means=mean, log_scales=0.5 * logvar
        )
        decoder_nll = mean_flat(decoder_nll) / math.log(2.0)
        return jnp.where(t == 0, decoder_nll, kl)

    # -------------------------------------------------------- sampling ----
    def p_sample_loop(self, denoise_fn: Callable, shape, rng,
                      model_mean_type: str = "eps",
                      model_var_type: str = "fixed_small",
                      clip_x0: bool = False):
        """Ancestral sampling as one lax.scan. denoise_fn(x, t_mapped)."""
        r0, rloop = jax.random.split(rng)
        x = jax.random.normal(r0, shape)

        def step(carry, i):
            x, r = carry
            t = jnp.full((shape[0],), self.num_timesteps - 1 - i, jnp.int32)
            out = denoise_fn(x, self.map_t(t))
            mean, var, logvar, _ = self.p_mean_variance(
                out, x, t, model_mean_type, model_var_type, clip_x0
            )
            r, rn = jax.random.split(r)
            noise = jax.random.normal(rn, shape)
            nonzero = (t > 0).astype(jnp.float32).reshape(
                (-1,) + (1,) * (x.ndim - 1)
            )
            x = mean + nonzero * jnp.exp(0.5 * logvar) * noise
            return (x, r), ()

        (x, _), _ = jax.lax.scan(step, (x, rloop),
                                 jnp.arange(self.num_timesteps))
        return x

    def ddim_step(self, model_out, x_t, t, noise,
                  model_mean_type: str = "eps",
                  model_var_type: str = "fixed_small",
                  clip_x0: bool = False, eta: float = 0.0):
        """One DDIM update x_t -> x_{t-1} (reference ddim_sample :513-561,
        Song et al. Eq. 12): eps re-derived from pred_x0 so it works for any
        mean type; no noise at t == 0."""
        _, _, _, pred_x0 = self.p_mean_variance(
            model_out, x_t, t, model_mean_type, model_var_type, clip_x0
        )
        eps = self.predict_eps_from_x0(x_t, t, pred_x0)
        ab = _ext(self.alphas_cumprod, t, x_t.ndim)
        ab_prev = _ext(self.alphas_cumprod_prev, t, x_t.ndim)
        sigma = (eta * jnp.sqrt((1 - ab_prev) / (1 - ab))
                 * jnp.sqrt(1 - ab / ab_prev))
        mean_pred = (pred_x0 * jnp.sqrt(ab_prev)
                     + jnp.sqrt(1 - ab_prev - jnp.square(sigma)) * eps)
        nonzero = (t != 0).astype(x_t.dtype).reshape(
            (-1,) + (1,) * (x_t.ndim - 1)
        )
        return mean_pred + nonzero * sigma * noise, pred_x0

    def ddim_reverse_step(self, model_out, x_t, t,
                          model_mean_type: str = "eps",
                          model_var_type: str = "fixed_small",
                          clip_x0: bool = False):
        """Deterministic x_t -> x_{t+1} encoding (reference
        ddim_reverse_sample :562-599, eta must be 0)."""
        _, _, _, pred_x0 = self.p_mean_variance(
            model_out, x_t, t, model_mean_type, model_var_type, clip_x0
        )
        eps = (_ext(self.sqrt_recip_ac, t, x_t.ndim) * x_t - pred_x0) \
            / _ext(self.sqrt_recipm1_ac, t, x_t.ndim)
        ab_next = _ext(np.append(self.alphas_cumprod[1:],
                                 0.0), t, x_t.ndim)
        return pred_x0 * jnp.sqrt(ab_next) + jnp.sqrt(1 - ab_next) * eps

    def ddim_sample_loop(self, denoise_fn: Callable, shape, rng,
                         model_mean_type: str = "eps",
                         model_var_type: str = "fixed_small",
                         clip_x0: bool = False, eta: float = 0.0):
        """DDIM sampling from noise as one lax.scan (reference
        ddim_sample_loop :600-632)."""
        r0, rloop = jax.random.split(rng)
        x = jax.random.normal(r0, shape)

        def step(carry, i):
            x, r = carry
            t = jnp.full((shape[0],), self.num_timesteps - 1 - i, jnp.int32)
            out = denoise_fn(x, self.map_t(t))
            r, rn = jax.random.split(r)
            noise = jax.random.normal(rn, shape)
            x, _ = self.ddim_step(out, x, t, noise, model_mean_type,
                                  model_var_type, clip_x0, eta)
            return (x, r), ()

        (x, _), _ = jax.lax.scan(step, (x, rloop),
                                 jnp.arange(self.num_timesteps))
        return x

    # -------------------------------------------------------- training ----
    def training_losses(self, denoise_fn: Callable, x0, t, rng,
                        loss_type: str = "rescaled_mse",
                        model_mean_type: str = "eps",
                        model_var_type: str = "learned_range",
                        noise=None):
        """Per-sequence [N] losses dict (reference training_losses
        :715-786): mean-flattened mse on the mean head (+ VLB on the
        stop-gradiented variance head for learned_range; rescaled_mse
        scales it by T/1000), or the pure VLB for kl/rescaled_kl
        (rescaled_kl scales by T). `noise` can be injected for parity
        tests, matching the reference's optional noise argument."""
        if noise is None:
            noise = jax.random.normal(rng, x0.shape)
        x_t = self.q_sample(x0, t, noise)
        out = denoise_fn(x_t, self.map_t(t))
        losses = {}
        if loss_type in ("mse", "rescaled_mse"):
            if model_var_type == "learned_range":
                mean_part, _ = jnp.split(out, 2, axis=-1)
                vb = self.vb_term(out, x0, x_t, t, model_mean_type,
                                  model_var_type)
                scale = self.num_timesteps / 1000.0 if loss_type == "rescaled_mse" else 1.0
                losses["vb"] = vb * scale
            else:
                mean_part = out
            if model_mean_type == "prev_x":
                target = self.q_posterior(x0, x_t, t)[0]
            else:
                target = {"eps": noise, "x_start": x0}[model_mean_type]
            losses["mse"] = mean_flat(jnp.square(target - mean_part))
            losses["loss"] = losses["mse"] + losses.get("vb", 0.0)
        else:  # pure VLB: loss_type "kl" or "rescaled_kl"
            losses["vb"] = self.vb_term(out, x0, x_t, t, model_mean_type,
                                        model_var_type, freeze_mean=False)
            if loss_type == "rescaled_kl":
                losses["vb"] = losses["vb"] * self.num_timesteps
            losses["loss"] = losses["vb"]
        return losses, x_t

    # ------------------------------------------------------- evaluation ---
    def prior_bpd(self, x0):
        """KL(q(x_T | x0) || N(0, I)) in bits, shape [N] (reference
        _prior_bpd :788-802)."""
        t = jnp.full((x0.shape[0],), self.num_timesteps - 1, jnp.int32)
        mean = _ext(self.sqrt_ac, t, x0.ndim) * x0
        logvar = jnp.log(_ext(1.0 - self.alphas_cumprod, t, x0.ndim))
        kl = 0.5 * (
            -1.0 - logvar + jnp.exp(logvar) + jnp.square(mean)
        )
        return mean_flat(kl) / math.log(2.0)

    def calc_bpd_loop(self, denoise_fn: Callable, x0,
                      model_mean_type: str = "eps",
                      model_var_type: str = "learned_range",
                      clip_x0: bool = True):
        """Full variational bound sweep over every timestep (reference
        calc_bpd_loop :804-857), one lax.scan: returns dict with total_bpd
        [N], prior_bpd [N], vb [N, T], mse [N, T]."""
        n = x0.shape[0]

        def step(_, i):
            t = jnp.full((n,), self.num_timesteps - 1 - i, jnp.int32)
            rng = jax.random.PRNGKey(0)  # deterministic eval noise per row
            noise = jax.random.normal(jax.random.fold_in(rng, i), x0.shape)
            x_t = self.q_sample(x0, t, noise)
            out = denoise_fn(x_t, self.map_t(t))
            vb = self.vb_term(out, x0, x_t, t, model_mean_type,
                              model_var_type, clip_x0=clip_x0,
                              freeze_mean=False)
            _, _, _, pred_x0 = self.p_mean_variance(
                out, x_t, t, model_mean_type, model_var_type, clip_x0
            )
            mse = mean_flat(jnp.square(pred_x0 - x0))
            return None, (vb, mse)

        _, (vb, mse) = jax.lax.scan(step, None, jnp.arange(self.num_timesteps))
        vb = jnp.flip(vb.T, axis=1)   # [N, T], t ascending like the reference
        mse = jnp.flip(mse.T, axis=1)
        prior = self.prior_bpd(x0)
        return dict(total_bpd=jnp.sum(vb, axis=1) + prior, prior_bpd=prior,
                    vb=vb, mse=mse)


def create_diffusion(
    timestep_respacing: str = "",
    noise_schedule: str = "linear",
    use_kl: bool = False,
    sigma_small: bool = False,
    predict_xstart: bool = False,
    learn_sigma: bool = True,
    rescale_learned_sigmas: bool = False,
    diffusion_steps: int = 1000,
):
    """Factory matching the reference diffusion/__init__.py:create_diffusion
    flag surface AND defaults (:10-46 — linear schedule, un-rescaled
    sigmas, and use_kl mapping to RESCALED_KL). Returns
    (GaussianDiffusion, config dict)."""
    gd = GaussianDiffusion.create(
        diffusion_steps, noise_schedule, timestep_respacing
    )
    cfg = dict(
        model_mean_type="x_start" if predict_xstart else "eps",
        model_var_type=(
            "learned_range" if learn_sigma
            else ("fixed_small" if sigma_small else "fixed_large")
        ),
        loss_type=(
            "rescaled_kl" if use_kl else
            ("rescaled_mse" if rescale_learned_sigmas else "mse")
        ),
    )
    return gd, cfg
