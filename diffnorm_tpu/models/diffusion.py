"""Latent DDPM "normalizer" over frozen speech-VAE latents.

Capability parity with the reference `diff_discrete` model
(fairseq/models/text_to_speech/diff_discrete.py:71-85, latent_module.py:
DDPMScheduler :1241-1297, denoiser Model :709-876, LatentDiscreteModel
:1300-1613). TPU-first redesign:

* schedule tables are precomputed float64 numpy, embedded as constants in the
  jitted graph (no host gather per step)
* the training forward is a single fused graph (q-sample, denoiser,
  min-SNR-weighted noise MSE, multitask reconstruction through the frozen VAE)
* `ddim_sample` runs the whole reverse loop as one `lax.scan` over
  start_step-1 steps — the headline kernel of the framework
* frozen-VAE composition is by parameter partition: the trainer only
  optimizes the `denoiser` subtree (see tasks/diffusion.py)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.layers import (
    ConditionableTransformer,
    LearnedSinusoidalPosEmb,
    sinusoidal_positions,
)
from diffnorm_tpu.models.vae import ModelHolder, SpeechVAEModule
from diffnorm_tpu.models.wavenet import Wavenet
from diffnorm_tpu.registry import register_architecture, register_model


# --------------------------------------------------------------------------
# Beta schedules (reference latent_module.py:1145-1223)
# --------------------------------------------------------------------------

def betas_for_alpha_bar(num_steps: int, alpha_bar, max_beta: float = 0.999):
    betas = []
    for i in range(num_steps):
        t1 = i / num_steps
        t2 = (i + 1) / num_steps
        betas.append(min(1 - alpha_bar(t2) / alpha_bar(t1), max_beta))
    return np.array(betas, dtype=np.float64)


def get_named_beta_schedule(name: str, num_steps: int) -> np.ndarray:
    if name == "linear":
        scale = 1000 / num_steps
        return np.linspace(scale * 0.0001, scale * 0.02, num_steps, dtype=np.float64)
    if name == "cosine":
        return betas_for_alpha_bar(
            num_steps, lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        )
    raise NotImplementedError(f"unknown beta schedule: {name}")


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Precomputed diffusion tables (reference DDPMScheduler :1241-1297)."""

    betas: np.ndarray
    alphas_cumprod: np.ndarray
    alphas_cumprod_prev: np.ndarray
    sqrt_alphas_cumprod: np.ndarray
    sqrt_one_minus_alphas_cumprod: np.ndarray

    @classmethod
    def create(cls, timesteps: int, name: str = "cosine") -> "DDPMSchedule":
        betas = get_named_beta_schedule(name, timesteps)
        ac = np.cumprod(1.0 - betas, axis=0)
        return cls(
            betas=betas,
            alphas_cumprod=ac,
            alphas_cumprod_prev=np.append(1.0, ac[:-1]),
            sqrt_alphas_cumprod=np.sqrt(ac),
            sqrt_one_minus_alphas_cumprod=np.sqrt(1.0 - ac),
        )

    @property
    def num_timesteps(self) -> int:
        return len(self.betas)

    def snr(self, t):
        """alpha_bar / (1 - alpha_bar) gathered at integer t [B]."""
        ac = jnp.asarray(self.alphas_cumprod, dtype=jnp.float32)[t]
        return ac / (1.0 - ac)


def extract(table: np.ndarray, t, ndim: int):
    """Gather table[t] ([B]) and right-broadcast to ndim dims (float32)."""
    vals = jnp.asarray(table, dtype=jnp.float32)[t]
    return vals.reshape(vals.shape + (1,) * (ndim - 1))


def safe_div(num, den, eps: float = 1e-10):
    return num / jnp.maximum(den, eps)


# --------------------------------------------------------------------------
# Denoiser network (reference Model, latent_module.py:709-876)
# --------------------------------------------------------------------------

class PerceiverResampler(nn.Module):
    """Resample a variable-length prompt into `num_latents` tokens
    (reference latent_module.py:416-471: learned latents + sinusoidal
    positions, cross-attention that includes the queries in the context,
    GEGLU feedforward, final RMSNorm)."""

    dim: int
    depth: int = 2
    dim_context: int = 768
    num_latents: int = 64
    dim_head: int = 64
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, prompt, prompt_mask=None, deterministic: bool = True):
        from diffnorm_tpu.models.layers import Attention, FeedForward, RMSNorm

        b = prompt.shape[0]
        ctx = nn.Dense(self.dim, dtype=self.dtype, name="proj_context")(prompt)
        latents = self.param(
            "latents", nn.initializers.normal(0.02),
            (self.num_latents, self.dim), jnp.float32,
        ).astype(self.dtype)
        lat_mask = jnp.ones((b, self.num_latents), bool)
        x = jnp.broadcast_to(latents[None], (b,) + latents.shape)
        x = x + sinusoidal_positions(lat_mask, self.dim).astype(x.dtype)
        if prompt_mask is None:
            prompt_mask = jnp.ones(prompt.shape[:2], bool)
        # queries are appended to the context (cross_attn_include_queries)
        full_mask = jnp.concatenate([lat_mask, prompt_mask], axis=1)
        for i in range(self.depth):
            context = jnp.concatenate([x, ctx], axis=1)
            x = x + Attention(
                dim=self.dim, dim_head=self.dim_head, heads=self.heads,
                dropout=0.1, dtype=self.dtype, name=f"attn_{i}",
            )(x, context=context, mask=full_mask, deterministic=deterministic)
            x = x + FeedForward(dim=self.dim, mult=4, dtype=self.dtype,
                                name=f"ff_{i}")(x)
        return RMSNorm(dim=self.dim, dtype=self.dtype, name="norm")(x)


class Denoiser(nn.Module):
    """1x1 conv latent->dim, FiLM-time WaveNet (4 stacks x 8 chains),
    sinusoidal positions, 12-layer adaptive-RMSNorm transformer, proj back.

    With condition_on_prompt=True (reference Model :747-773, unused by the
    released DiffNorm recipe): a PerceiverResampler compresses 768-d prompt
    features into 64 cross-attention tokens, the mean-pooled prompt joins
    the time condition, and per-sequence classifier-free dropout swaps in
    learned null embeddings.

    The time-dependent FiLM/adaptive-norm projections hold the bulk of the
    parameters ([dim_time, 2*dim] per wavenet block and per norm). Sampling
    loops precompute them for EVERY diffusion step at once
    (`precompute_step_conds`) and index inside the scan — those weights then
    stream from HBM once per sampling call instead of once per step
    (profiled ~5x wall-time win, PERFORMANCE.md)."""

    dim: int = 512
    latent_dim: int = 128
    depth: int = 12
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    wavenet_layers: int = 8
    wavenet_stacks: int = 4
    dim_cond_mult: int = 4
    condition_on_prompt: bool = False
    dim_prompt: int = 768
    num_latents_m: int = 64
    resampler_depth: int = 2
    quant_int8: bool = False  # int8 W8A8 inference matmuls
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        dim_time = self.dim * self.dim_cond_mult
        cond_mult = self.dim_cond_mult * (2 if self.condition_on_prompt else 1)
        self.time_emb = LearnedSinusoidalPosEmb(self.dim, name="time_emb")
        self.time_proj = nn.Dense(dim_time, dtype=self.dtype, name="time_proj")
        if self.condition_on_prompt:
            self.to_prompt_cond = nn.Dense(dim_time, dtype=self.dtype,
                                           name="to_prompt_cond")
            self.null_prompt_cond = self.param(
                "null_prompt_cond", nn.initializers.normal(0.02),
                (dim_time,), jnp.float32,
            )
            self.null_prompt_tokens = self.param(
                "null_prompt_tokens", nn.initializers.normal(0.02),
                (self.num_latents_m, self.dim), jnp.float32,
            )
            self.perceiver_resampler = PerceiverResampler(
                dim=self.dim, depth=self.resampler_depth,
                dim_context=self.dim_prompt, num_latents=self.num_latents_m,
                dim_head=self.dim_head, heads=self.heads, dtype=self.dtype,
                name="perceiver_resampler",
            )
        self.init_conv = nn.Dense(self.dim, dtype=self.dtype, name="init_conv")
        self.wavenet = Wavenet(
            dim=self.dim,
            stacks=self.wavenet_stacks,
            layers=self.wavenet_layers,
            cond_dim=self.dim * cond_mult,
            quant=self.quant_int8,
            dtype=self.dtype,
            name="wavenet",
        )
        self.transformer = ConditionableTransformer(
            dim=self.dim,
            depth=self.depth,
            dim_head=self.dim_head,
            heads=self.heads,
            ff_mult=self.ff_mult,
            ff_causal_conv=True,
            cond_dim=self.dim * cond_mult,
            cross_attn=self.condition_on_prompt,
            quant_int8=self.quant_int8,
            dtype=self.dtype,
            name="transformer",
        )
        self.final_proj = nn.Dense(self.latent_dim, dtype=self.dtype,
                                   name="final_proj")

    def _time_cond(self, times):
        return nn.silu(self.time_proj(self.time_emb(times)))

    def precompute_step_conds(self, times_all):
        """times_all: [S, B] step times -> pytree of per-step conditioning
        (FiLM projections for every wavenet block and transformer norm),
        leaves shaped [S, B, ...]. Unconditional denoiser only (the prompt
        path re-projects per step)."""
        assert not self.condition_on_prompt
        s, b = times_all.shape
        t = self._time_cond(times_all.reshape(-1))
        conds = {
            "wavenet": self.wavenet.precompute_film(t),
            "transformer": self.transformer.precompute_film(t),
        }
        return jax.tree_util.tree_map(
            lambda a: a.reshape((s, b) + a.shape[1:]), conds
        )

    def __call__(self, x, times, mask=None, deterministic: bool = True,
                 prompt=None, prompt_mask=None, cond_drop_prob: float = 0.0,
                 step_cond=None, pos=None):
        """x: [B, T, latent], times: [B] (float or int), mask: [B, T] bool.
        step_cond: one step's slice of precompute_step_conds output.
        pos: optional precomputed sinusoidal positions [B, T, dim] — they
        depend only on the (loop-invariant) mask, and XLA does not hoist
        the sin/cos fusion out of the DDIM scan (~60 us/step on v5e), so
        sampling loops precompute them once."""
        context = None
        if step_cond is not None:
            t = None
            wavenet_film = step_cond["wavenet"]
            transformer_film = step_cond["transformer"]
        else:
            t = self._time_cond(times)
            wavenet_film = transformer_film = None

        if self.condition_on_prompt:
            assert prompt is not None and t is not None
            b = x.shape[0]
            if prompt_mask is None:
                prompt_mask = jnp.ones(prompt.shape[:2], bool)
            if cond_drop_prob >= 1.0:
                drop = jnp.ones((b,), bool)
            elif cond_drop_prob <= 0.0:
                drop = jnp.zeros((b,), bool)
            else:
                drop = jax.random.bernoulli(
                    self.make_rng("cg"), cond_drop_prob, (b,)
                )
            masked_prompt = jnp.where(prompt_mask[..., None], prompt, 0.0)
            pooled = jnp.mean(masked_prompt, axis=1)
            prompt_cond = nn.silu(self.to_prompt_cond(pooled))
            null_cond = self.null_prompt_cond.astype(prompt_cond.dtype)
            prompt_cond = jnp.where(drop[:, None], null_cond[None], prompt_cond)
            t = jnp.concatenate([t, prompt_cond], axis=-1)

            resampled = self.perceiver_resampler(
                prompt, prompt_mask, deterministic=deterministic
            )
            null_tokens = self.null_prompt_tokens.astype(resampled.dtype)
            context = jnp.where(
                drop[:, None, None], null_tokens[None], resampled
            )

        h = self.init_conv(x)
        h = self.wavenet(h, t, film=wavenet_film)
        if mask is None:
            mask = jnp.ones(h.shape[:2], dtype=bool)
        if pos is None:
            pos = sinusoidal_positions(mask, self.dim)
        h = h + pos.astype(h.dtype)
        h = self.transformer(
            h, cond=t, mask=mask, context=context,
            deterministic=deterministic, film=transformer_film,
        )
        return self.final_proj(h)

    def forward_with_cond_scale(self, x, times, mask=None, prompt=None,
                                prompt_mask=None, cond_scale: float = 1.0):
        """Classifier-free guidance (reference :813-826):
        out = null + scale * (cond - null)."""
        cond = self(x, times, mask, deterministic=True, prompt=prompt,
                    prompt_mask=prompt_mask, cond_drop_prob=0.0)
        if cond_scale == 1.0:
            return cond
        null = self(x, times, mask, deterministic=True, prompt=prompt,
                    prompt_mask=prompt_mask, cond_drop_prob=1.0)
        return null + (cond - null) * cond_scale


# --------------------------------------------------------------------------
# Latent diffusion module (reference LatentDiscreteModel :1300-1613)
# --------------------------------------------------------------------------

class LatentDiffusionModule(nn.Module):
    dim: int = 512
    latent_dim: int = 128
    feature_dim: int = 768
    vocab_size: int = 1004
    timesteps: int = 200
    schedule_name: str = "cosine"
    min_snr_gamma: float = 5.0
    multitask: bool = True
    quant_int8: bool = False
    denoiser_depth: int = 12
    wavenet_layers: int = 8
    wavenet_stacks: int = 4
    vae_decoder_depth: int = 6
    vae_decoder_dim_head: int = 96
    vae_decoder_heads: int = 8
    chan_mults: Optional[tuple] = None
    # use_vae=False runs the diffusion directly in feature space (reference
    # continuous variants: tasks "speech_diffusion"/"speech_diffusion_hubert")
    use_vae: bool = True
    # use_cond=True adds PerceiverResampler source-prompt conditioning with
    # classifier-free dropout (reference diff_discrete.py use_cond flag —
    # off in the released recipe)
    use_cond: bool = False
    dtype: jnp.dtype = jnp.float32

    def _make_denoiser(self):
        return Denoiser(
            dim=self.dim, latent_dim=self.latent_dim,
            depth=self.denoiser_depth,
            wavenet_layers=self.wavenet_layers,
            wavenet_stacks=self.wavenet_stacks,
            condition_on_prompt=self.use_cond,
            dim_prompt=self.feature_dim,
            quant_int8=self.quant_int8,
            dtype=self.dtype,
            name="denoiser",
        )

    def setup(self):
        if not self.use_vae:
            self.denoiser = self._make_denoiser()
            self.schedule = DDPMSchedule.create(self.timesteps, self.schedule_name)
            return
        self.vae = SpeechVAEModule(
            dim=self.feature_dim,
            latent_dim=self.latent_dim,
            vocab_size=self.vocab_size,
            decoder_depth=self.vae_decoder_depth,
            decoder_dim_head=self.vae_decoder_dim_head,
            decoder_heads=self.vae_decoder_heads,
            chan_mults=self.chan_mults,
            dtype=self.dtype,
            name="vae",
        )
        self.denoiser = self._make_denoiser()
        self.schedule = DDPMSchedule.create(self.timesteps, self.schedule_name)

    def encode(self, feature, rng, noise=None):
        if not self.use_vae:
            return feature
        return self.vae.encode(feature, rng, noise=noise)

    def decode(self, latent, mask):
        return self.vae.decode(latent, mask)

    def denoise(self, x_t, times, mask, deterministic: bool = True,
                prompt=None, prompt_mask=None, cond_drop_prob: float = 0.0,
                step_cond=None, pos=None):
        if self.use_cond:
            return self.denoiser(
                x_t, times, mask, deterministic=deterministic, prompt=prompt,
                prompt_mask=prompt_mask, cond_drop_prob=cond_drop_prob,
            )
        return self.denoiser(x_t, times, mask, deterministic=deterministic,
                             step_cond=step_cond, pos=pos)

    def precompute_step_conds(self, times_all):
        return self.denoiser.precompute_step_conds(times_all)

    def precompute_pos(self, mask):
        """Loop-invariant sinusoidal positions for the denoiser (hoisted out
        of sampling scans; see Denoiser.__call__)."""
        return sinusoidal_positions(mask, self.denoiser.dim)

    def __call__(self, feature, mask, rng, deterministic: bool = True,
                 prompt=None, prompt_mask=None, times=None, enc_noise=None,
                 x1_noise=None, q_noise=None):
        """Training forward: q-sample + denoiser prediction.

        Returns a dict with everything the criterion needs to assemble the
        DiffNorm multitask loss (reference forward :1514-1613): pred/true
        noise, the recovered x_1_hat decoded through the frozen VAE, and the
        min-SNR loss weights.

        times/enc_noise/x1_noise/q_noise override the in-forward random
        draws (t ~ Unif(1, T), the VAE posterior sample, the beta_0 jitter
        and the q-sample noise) so parity tests can share a noise stream
        with the real reference forward (tests/test_reference_parity.py).
        """
        b = feature.shape[0]
        r_t, r_enc, r_x1, r_q = jax.random.split(rng, 4)
        if times is None:
            times = jax.random.randint(r_t, (b,), 1, self.timesteps)

        # frozen-VAE encode (t ~ no_grad; params frozen by the optimizer mask)
        z = jax.lax.stop_gradient(self.encode(feature, r_enc, noise=enc_noise))

        beta0 = float(self.schedule.betas[0])
        if x1_noise is None:
            x1_noise = jax.random.normal(r_x1, z.shape, z.dtype)
        x1 = z + x1_noise * beta0

        sac = extract(self.schedule.sqrt_alphas_cumprod, times, z.ndim)
        s1mac = extract(self.schedule.sqrt_one_minus_alphas_cumprod, times, z.ndim)
        true_noise = (jax.random.normal(r_q, z.shape, z.dtype)
                      if q_noise is None else q_noise)
        x_t = sac * x1 + s1mac * true_noise

        pred_noise = self.denoise(
            x_t, times, mask, deterministic=deterministic, prompt=prompt,
            prompt_mask=prompt_mask,
            cond_drop_prob=0.1 if self.use_cond else 0.0,  # reference :1554
        )

        snr = self.schedule.snr(times)
        loss_weight = jnp.minimum(snr, self.min_snr_gamma) / snr

        out = dict(
            pred_noise=pred_noise,
            true_noise=true_noise,
            loss_weight=loss_weight,
            times=times,
        )
        if self.use_vae:
            x1_hat = safe_div(x_t - s1mac * pred_noise, sac)
            recon_feature, lm_logits = self.vae.decode(x1_hat, mask)
            out["recon_feature"] = recon_feature
            out["lm_logits"] = lm_logits
        return out

def calibrate_act_scales(model, variables, feature, mask, rng,
                         start_step: int = 50, n_points: int = 6):
    """Record per-site activation amax over representative denoise steps
    for static-scale int8 (ops/quant.py site_quantize / quantize_act_static,
    DIFFNORM_INT8_STATIC=1). Runs the denoiser at n_points timesteps spread
    over the reverse trajectory on q-sampled latents of `feature` and
    returns `variables` with the populated 'quant_stats' collection merged.

    Requires an int8-enabled model (cfg quant_int8 / DIFFNORM_INT8=1);
    a float model records nothing and the static flag then no-ops."""
    import os

    module = model.module
    schedule = DDPMSchedule.create(module.timesteps, module.schedule_name)
    r_enc, r_noise = jax.random.split(rng)
    z = module.apply(
        variables, feature, r_enc, method=LatentDiffusionModule.encode)
    b = z.shape[0]
    noise = jax.random.normal(r_noise, z.shape, z.dtype)
    ts = np.unique(np.linspace(1, start_step - 1, n_points).astype(np.int32))
    old = os.environ.get("DIFFNORM_INT8_CALIB")
    os.environ["DIFFNORM_INT8_CALIB"] = "1"
    try:
        stats = None
        for t_int in ts[::-1]:
            t = jnp.full((b,), int(t_int), jnp.int32)
            sac = extract(schedule.sqrt_alphas_cumprod, t, z.ndim)
            s1mac = extract(schedule.sqrt_one_minus_alphas_cumprod, t, z.ndim)
            x = sac * z + s1mac * noise
            vars_in = variables if stats is None else {
                **variables, "quant_stats": stats}
            _, mut = module.apply(
                vars_in, x, t, mask, method=LatentDiffusionModule.denoise,
                mutable=["quant_stats"],
            )
            stats = mut.get("quant_stats", stats)
    finally:
        if old is None:
            os.environ.pop("DIFFNORM_INT8_CALIB", None)
        else:
            os.environ["DIFFNORM_INT8_CALIB"] = old
    if stats is None:
        return variables
    return {**variables, "quant_stats": stats}


def ddim_sample(
    model: "LatentDiffusionModel",
    variables,
    feature,
    mask,
    rng,
    start_step: int = 50,
    enc_noise=None,
    init_noise=None,
    stride: int = 1,
):
    """Partial-noise DDIM normalization (reference ddim_sample :1385-1471).

    feature: [B, T, 768] reduced target features; mask: [B, T] True=valid.
    Returns (pred_units [B, T] int32 with the -4 dictionary offset applied,
    recon_feature [B, T, 768]).

    The reverse loop runs as one lax.scan over times start_step-1 .. 1 with
    eta=0 (deterministic DDIM), matching the reference's early-break-at-t==1
    semantics (t=0 is never evaluated). Lives outside the flax module so the
    scan body is a pure `apply` call — jit this whole function.

    `stride` > 1 respaces the reverse chain to every stride-th timestep
    (IDDPM timestep respacing, reference fairseq/models/text_to_speech/
    respace.py space_timesteps / gaussian_diffusion.py DDIM) — fewer
    denoiser evaluations compound less model error; stride >= start_step is
    a single x1-hat jump. stride=1 is the reference's exact step-by-step
    loop. The recovery effect of normalization on an undertrained denoiser
    is measurably stronger with coarse respacing
    (tests/test_diffnorm_effect.py).

    Start convention (deliberate, advisor r4): the strided chain's FIRST
    denoiser evaluation is at t=start_step — the true noise level of the
    just-injected sample — so its times are start_step, start_step-stride,
    ... The reference's step-by-step loop instead starts at start_step-1
    (one step below the injection level, latent_module.py:1411), which the
    stride=1 path reproduces exactly for parity. The strided chain is
    therefore NOT a strict subsequence respacing of the stride=1 chain:
    stride>=start_step gives the single x1-hat jump evaluated at the
    injection level, which is the numerically meaningful choice.
    """
    module = model.module
    schedule = DDPMSchedule.create(module.timesteps, module.schedule_name)
    r_enc, r_noise = jax.random.split(rng)
    z = module.apply(
        variables, feature, r_enc, method=LatentDiffusionModule.encode,
        noise=enc_noise,
    )
    b = z.shape[0]

    t_start = jnp.full((b,), start_step, dtype=jnp.int32)
    sac = extract(schedule.sqrt_alphas_cumprod, t_start, z.ndim)
    s1mac = extract(schedule.sqrt_one_minus_alphas_cumprod, t_start, z.ndim)
    noise0 = (jnp.asarray(init_noise, z.dtype) if init_noise is not None
              else jax.random.normal(r_noise, z.shape, z.dtype))
    x = sac * z + s1mac * noise0

    if stride > 1:
        # denoise at t, jump to t-stride (clamped to 0 = the x1_hat jump);
        # prev times ride alongside so the scan body can respace
        times = jnp.arange(start_step, 0, -stride)
        prev_times = jnp.maximum(times - stride, 0)
    else:
        times = jnp.arange(start_step - 1, 0, -1)
        prev_times = None
    # hoist every time-dependent FiLM/adaptive-norm projection out of the
    # scan: one [S*B, dim_time] batched matmul per projection instead of a
    # full HBM weight read per step (PERFORMANCE.md)
    step_conds = None
    pos = None
    if not module.use_cond:
        times_all = jnp.broadcast_to(times[:, None], (times.shape[0], b))
        step_conds = module.apply(
            variables, times_all.astype(jnp.float32),
            method=LatentDiffusionModule.precompute_step_conds,
        )
        pos = module.apply(
            variables, mask, method=LatentDiffusionModule.precompute_pos,
        )

    def step(x, xs):
        if stride > 1:
            time, prev_time, step_cond = xs
        else:
            time, step_cond = xs
            prev_time = None
        t = jnp.full((b,), time, dtype=jnp.int32)
        noise = module.apply(
            variables, x, t, mask, method=LatentDiffusionModule.denoise,
            step_cond=step_cond, pos=pos,
        )
        sac_t = extract(schedule.sqrt_alphas_cumprod, t, noise.ndim)
        s1mac_t = extract(schedule.sqrt_one_minus_alphas_cumprod, t, noise.ndim)
        x1_hat = safe_div(x - s1mac_t * noise, sac_t)
        pred_noise = safe_div(x - sac_t * x1_hat, s1mac_t)
        if stride > 1:
            p = jnp.full((b,), prev_time, dtype=jnp.int32)
            ab_prev = extract(schedule.alphas_cumprod, p, noise.ndim)
        else:
            ab_prev = extract(schedule.alphas_cumprod_prev, t, noise.ndim)
        x_next = x1_hat * jnp.sqrt(ab_prev) + jnp.sqrt(1.0 - ab_prev) * pred_noise
        return x_next, ()

    # unroll pairs of steps: halves the while-loop iteration overhead
    # (carry copies + loop bookkeeping measured ~8 ms of the 505 ms chain)
    # and lets XLA fuse across adjacent steps (jax runs the odd tail
    # iteration outside the loop)
    xs = ((times, prev_times, step_conds) if stride > 1
          else (times, step_conds))
    x, _ = jax.lax.scan(step, x, xs, unroll=4 if stride == 1 else 1)

    recon_feature, lm_logits = module.apply(
        variables, x, mask, method=LatentDiffusionModule.decode
    )
    pred_units = jnp.argmax(lm_logits, axis=-1).astype(jnp.int32) - 4
    return pred_units, recon_feature


@register_model("latent_diffusion")
class LatentDiffusionModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "LatentDiffusionModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = LatentDiffusionModule(
            dim=cfg.get("hidden_dim", 512),
            latent_dim=cfg.get("latent_dim", 128),
            feature_dim=cfg.get("feature_dim", 768),
            vocab_size=vocab or 1004,
            timesteps=cfg.get("timesteps", 200),
            schedule_name=cfg.get("schedule", "cosine"),
            min_snr_gamma=cfg.get("min_snr_gamma", 5.0),
            multitask=cfg.get("multitask", True),
            denoiser_depth=cfg.get("denoiser_depth", 12),
            wavenet_layers=cfg.get("wavenet_layers", 8),
            wavenet_stacks=cfg.get("wavenet_stacks", 4),
            quant_int8=bool(cfg.get(
                "quant_int8",
                __import__("os").environ.get("DIFFNORM_INT8") == "1")),
            vae_decoder_depth=cfg.get("vae_decoder_depth", 6),
            vae_decoder_dim_head=cfg.get("vae_decoder_dim_head", 96),
            vae_decoder_heads=cfg.get("vae_decoder_heads", 8),
            chan_mults=tuple(cfg["chan_mults"]) if cfg.get("chan_mults") else None,
            use_vae=cfg.get("use_vae", True),
            use_cond=cfg.get("use_cond", False),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("latent_diffusion", "diff_discrete")
def diff_discrete_arch(cfg: Config):
    """Defaults parity with diff_discrete.py:84 (hid 512, T=200, multitask)."""
    cfg.setdefault("hidden_dim", 512)
    cfg.setdefault("latent_dim", 128)
    cfg.setdefault("timesteps", 200)
    cfg.setdefault("multitask", True)


@register_architecture("latent_diffusion", "diff_latent")
def diff_latent_arch(cfg: Config):
    """Continuous latent diffusion (reference task "speech_diffusion"):
    noise objective only, no unit-LM multitask."""
    diff_discrete_arch(cfg)
    cfg.setdefault("multitask", False)


@register_architecture("latent_diffusion", "diff_hubert")
def diff_hubert_arch(cfg: Config):
    """Feature-space diffusion over raw 768-d mHuBERT features (reference
    task "speech_diffusion_hubert"): no VAE at all."""
    cfg.setdefault("hidden_dim", 512)
    cfg.setdefault("latent_dim", 768)
    cfg.setdefault("timesteps", 200)
    cfg["use_vae"] = False
    cfg["multitask"] = False


@register_architecture("latent_diffusion", "diffusion_transformer")
def diffusion_transformer_arch(cfg: Config):
    """DiT-style pure-transformer denoiser (reference diff_transformer.py
    DiffusionTransformerModel, mostly used for arg defaults): the wavenet
    stacks collapse to zero and depth grows."""
    diff_discrete_arch(cfg)
    cfg.setdefault("wavenet_stacks", 1)
    cfg.setdefault("wavenet_layers", 1)
    cfg.setdefault("denoiser_depth", 16)
