"""Score-entropy discrete diffusion (SEDD) over unit sequences.

Capability parity with the reference's discrete-diffusion alternative to
CMLM (fairseq/models/score_entropy/{score_model.py, graph.py, noise.py,
sampling_utils.py}, tasks "sedd"/"sedd_lm"): absorbing-state graph with a
log-linear noise schedule, a time-conditioned transformer scoring network,
the denoising score-entropy objective, and Euler / analytic reverse
sampling — all as jit-compiled graphs (the reverse sampler is one lax.scan).

Math (Lou et al., "Discrete Diffusion Modeling by Estimating the Ratios of
the Data Distribution"), matching the reference exactly
(parity-tested against the verbatim-loaded reference graph.py/noise.py in
tests/test_sedd_reference_parity.py):
* absorbing graph: tokens independently jump to MASK with prob
  1 - exp(-sigma(t)); sigma loglinear: sigma(t) = -log(1 - (1-eps) t)
* score parameterization (score_model.py sedd_forward): raw logits are
  shifted by -log(expm1(sigma)) - log(V) ("scale_by_sigma") and the entry
  at the CURRENT token is set to 0 (x cannot transition to itself)
* denoising score entropy at absorbed positions (graph.py
  Absorbing.score_entropy): with r = 1/expm1(sigma),
  loss = sum_{v<MASK} exp(s_v) - r * s_{x0} + r (log r - 1),
  weighted by dsigma, summed over positions, MEAN over batch
* reverse sampling is the analytic predictor (sampling_utils.py
  AnalyticPredictor + score_model.py inference): probs =
  staggered_score(exp(s), dsigma) * transp_transition(x, dsigma), gumbel
  categorical draw, MASK column truncated on the final step
"""

from __future__ import annotations

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
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD = 1


def loglinear_sigma(t, eps: float = 1e-3):
    """sigma(t) and its derivative; t in (0, 1] (reference noise.py
    LogLinearNoise total_noise/rate_noise)."""
    sigma = -jnp.log1p(-(1 - eps) * t)
    dsigma = (1 - eps) / (1 - (1 - eps) * t)
    return sigma, dsigma


def score_entropy_absorb(log_score, sigma, x_t, x0, mask_id):
    """Per-position denoising score entropy for the absorbing graph
    (reference graph.py Absorbing.score_entropy :246-274): zero everywhere
    except positions absorbed to MASK, where with r = 1/expm1(sigma):
      sum_{v != MASK} exp(s_v)  -  r * s_{x0}  +  r (log r - 1).

    log_score [B, T, V+1]; sigma [B]; x_t/x0 [B, T]."""
    ls = log_score.astype(jnp.float32)
    rel = x_t == mask_id
    # jnp.expm1 is the correctly-rounded form of the reference's
    # where(sigma < 0.5, expm1(sigma), exp(sigma)-1) branch
    ratio = 1.0 / jnp.expm1(sigma)[:, None]
    neg = ratio * jnp.take_along_axis(ls, x0[..., None], axis=-1)[..., 0]
    pos = jnp.sum(jnp.exp(ls[..., :-1]), axis=-1)
    const = ratio * (jnp.log(ratio) - 1.0)
    return jnp.where(rel, pos - neg + const, 0.0)


def staggered_score_absorb(score, dsigma):
    """e^{-dsigma E} applied to a score vector (reference graph.py
    Absorbing.staggered_score): scale by exp(dsigma), then add
    (1 - exp(dsigma)) * sum(score) into the MASK column.
    score [B, T, V+1]; dsigma [B]."""
    d = dsigma[:, None, None]
    extra = (1.0 - jnp.exp(dsigma)[:, None]) * jnp.sum(score, axis=-1)
    out = score * jnp.exp(d)
    return out.at[..., -1].add(extra)


def transp_transition_absorb(x, dsigma, dim):
    """Row x of exp(dsigma * Q^T) (reference graph.py
    Absorbing.transp_transition): exp(-dsigma) at the current token, plus
    (1 - exp(-dsigma)) across ALL columns when x is the MASK state.
    x [B, T]; dsigma [B]; returns [B, T, dim]."""
    d = dsigma[:, None, None]
    edge = jnp.exp(-d) * jax.nn.one_hot(x, dim, dtype=jnp.float32)
    stay_mask = jnp.where(x == dim - 1, -jnp.expm1(-dsigma[:, None]), 0.0)
    return edge + stay_mask[..., None]


def sample_categorical(probs, rng):
    """Gumbel-trick categorical draw over (unnormalized) probabilities,
    exactly the reference sampling_utils.sample_categorical formula:
    argmax(probs / (1e-10 - log(u + 1e-10)))."""
    u = jax.random.uniform(rng, probs.shape)
    gumbel_norm = 1e-10 - jnp.log(u + 1e-10)
    return jnp.argmax(probs / gumbel_norm, axis=-1).astype(jnp.int32)


def analytic_update_probs(log_score, x, dsigma, mask_id, truncate: bool):
    """One AnalyticPredictor update's categorical probabilities (reference
    sampling_utils.py:53-62 + score_model.py inference :1398-1405): probs =
    staggered_score(exp(s), dsigma) * transp_transition(x, dsigma), with the
    MASK column dropped (zeroed) on the final step."""
    score = jnp.exp(log_score.astype(jnp.float32))
    stag = staggered_score_absorb(score, dsigma)
    probs = stag * transp_transition_absorb(x, dsigma, mask_id + 1)
    if truncate:
        probs = probs.at[..., -1].set(0.0)
    return probs


class SEDDScoreModel(nn.Module):
    """Time-conditioned transformer over (possibly masked) token sequences.
    The MASK (absorbing) state is the last vocab index."""

    vocab_size: int  # includes the absorbing MASK state
    dim: int = 512
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
    scale_by_sigma: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens, sigma, mask=None, deterministic: bool = True):
        """tokens: [B, T]; sigma: [B]; returns log-scores [B, T, V]."""
        t = LearnedSinusoidalPosEmb(self.dim, name="time_emb")(sigma)
        t = nn.Dense(self.dim * 4, dtype=self.dtype, name="time_proj")(t)
        t = nn.silu(t)

        x = nn.Embed(
            self.vocab_size, self.dim,
            embedding_init=nn.initializers.normal(self.dim ** -0.5),
            dtype=self.dtype, name="embed",
        )(tokens)
        if mask is None:
            mask = jnp.ones(tokens.shape, bool)
        x = x + sinusoidal_positions(mask, self.dim).astype(x.dtype)
        x = ConditionableTransformer(
            dim=self.dim, depth=self.depth, dim_head=self.dim_head,
            heads=self.heads, cond_dim=self.dim * 4, dtype=self.dtype,
            name="transformer",
        )(x, cond=t, mask=mask, deterministic=deterministic)
        logits = nn.Dense(self.vocab_size, dtype=self.dtype, name="out")(x)
        if self.scale_by_sigma:
            # reference score_model.py sedd_forward :1190-1195: shift the raw
            # outputs by -log(expm1(sigma)) - log(V-1) so the mean log-score
            # starts near 0 under the absorbing prior
            esigm1_log = jnp.log(jnp.expm1(sigma)).astype(logits.dtype)
            logits = (logits - esigm1_log[:, None, None]
                      - math.log(self.vocab_size - 1))
        # the score of transitioning to the CURRENT state is identically 0:
        # the reference scatters 0 at the token index (it does NOT shift the
        # other entries)
        return jnp.where(
            jax.nn.one_hot(tokens, self.vocab_size, dtype=bool),
            jnp.zeros((), logits.dtype), logits,
        )


class SEDDModule(nn.Module):
    vocab_size: int  # data vocab (without MASK)
    dim: int = 512
    depth: int = 8
    heads: int = 8
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.mask_id = self.vocab_size  # absorbing state appended
        self.score_model = SEDDScoreModel(
            vocab_size=self.vocab_size + 1, dim=self.dim, depth=self.depth,
            heads=self.heads, dtype=self.dtype, name="score",
        )

    def perturb(self, tokens, t, rng, able_mask=None):
        """Absorbing forward process (reference graph.py sample_transition +
        score_model.py forward :1176-1180): mask each noiseable token w.p.
        1 - exp(-sigma). able_mask excludes positions the reference never
        perturbs (pads and the eos unit)."""
        sigma, _ = loglinear_sigma(t)
        p_mask = 1.0 - jnp.exp(-sigma)[:, None]
        drop = jax.random.uniform(rng, tokens.shape) < p_mask
        if able_mask is not None:
            drop = drop & able_mask
        return jnp.where(drop, self.mask_id, tokens)

    def __call__(self, tokens, valid_mask, rng, deterministic: bool = True):
        """Training: sample t, perturb noiseable positions, score, reference
        score-entropy loss parts (score_model.py forward :1168-1207).

        Returns dict(loss_per_pos [B, T], weight [B], x_t)."""
        b = tokens.shape[0]
        r_t, r_p = jax.random.split(rng)
        # reference sample_time: (1 - eps) * U[0,1) + eps
        t = (1.0 - 1e-3) * jax.random.uniform(r_t, (b,)) + 1e-3
        sigma, dsigma = loglinear_sigma(t)
        # able_to_noise = (units != pad-0) & (units != eos-2) in the
        # reference's pad-0 unit stream; valid_mask already excludes pads
        able = valid_mask & (tokens != 2)
        x_t = self.perturb(tokens, t, r_p, able_mask=able)
        scores = self.score_model(
            x_t, sigma, mask=valid_mask, deterministic=deterministic
        )
        is_masked = x_t == self.mask_id
        per_pos = score_entropy_absorb(scores, sigma, x_t, tokens, self.mask_id)
        per_pos = jnp.where(able, per_pos, 0.0)
        return dict(loss_per_pos=per_pos, weight=dsigma, x_t=x_t,
                    n_masked=jnp.sum(is_masked & valid_mask, axis=1))

    def score(self, tokens, sigma, valid_mask):
        return self.score_model(tokens, sigma, mask=valid_mask,
                                deterministic=True)


def sedd_sample(
    model,
    variables,
    batch_size: int,
    seq_len: int,
    rng,
    steps: int = 64,
    valid_mask=None,
    eps: float = 1e-5,
):
    """Reverse sampling from all-MASK with the analytic predictor, one
    lax.scan (reference score_model.py inference :1355-1414 — timesteps
    linspace(1, eps, steps+1), dt = (1-eps)/steps, probs =
    staggered_score(exp(s), dsigma) * transp_transition(x, dsigma), gumbel
    categorical, MASK column truncated on the final step so every position
    resolves to a data token)."""
    module = model.module
    mask_id = module.vocab_size
    tokens = jnp.full((batch_size, seq_len), mask_id, jnp.int32)
    if valid_mask is None:
        valid_mask = jnp.ones((batch_size, seq_len), bool)

    ts = jnp.linspace(1.0, eps, steps + 1)
    dt = (1.0 - eps) / steps

    def one_update(tokens, t, rng, truncate):
        sigma, _ = loglinear_sigma(jnp.broadcast_to(t, (batch_size,)))
        sigma_next, _ = loglinear_sigma(jnp.broadcast_to(t - dt, (batch_size,)))
        dsigma = sigma - sigma_next
        log_score = module.apply(
            variables, tokens, sigma, valid_mask, method=SEDDModule.score
        )
        probs = analytic_update_probs(log_score, tokens, dsigma, mask_id,
                                      truncate)
        return sample_categorical(probs, rng)

    def step(carry, i):
        tokens, rng = carry
        rng, r = jax.random.split(rng)
        tokens = one_update(tokens, ts[i], r, truncate=False)
        return (tokens, rng), ()

    (tokens, rng), _ = jax.lax.scan(
        step, (tokens, rng), jnp.arange(steps - 1)
    )
    rng, r = jax.random.split(rng)
    return one_update(tokens, ts[steps - 1], r, truncate=True)


def sedd_refine(model, variables, input_tokens, valid_mask, rng,
                steps: int = 16, eps: float = 1e-5, unk: int = 3):
    """Refine a partially-masked NAT canvas with SEDD (reference
    score_model.py sedd_refine :1416-1460): UNK placeholders become the
    absorbing MASK state, the per-row start time is recovered from the
    masked fraction (sigma = -log(1 - n_masked/n_valid), t =
    (exp(-sigma) - 1)/(eps_noise - 1)), each row follows its own
    linspace(start_t, eps, steps+1) while dsigma uses the GLOBAL
    dt = (1-eps)/steps (reference quirk, kept), and only the originally
    masked positions are allowed to change."""
    module = model.module
    mask_id = module.vocab_size
    x = jnp.where(input_tokens == unk, mask_id, input_tokens)
    masked = x == mask_id
    n_masked = jnp.sum(masked & valid_mask, axis=1).astype(jnp.float32)
    n_all = jnp.maximum(jnp.sum(valid_mask, axis=1), 1).astype(jnp.float32)
    frac = jnp.clip(n_masked / n_all, 0.0, 1.0 - 1e-6)
    sigma0 = -jnp.log1p(-frac)
    start_t = (jnp.exp(-sigma0) - 1.0) / (1e-3 - 1.0)  # invert loglinear
    # per-row timesteps: linspace(start_t, eps, steps+1) evaluated lazily
    row_dt = (start_t - eps) / steps  # [B]
    dt = (1.0 - eps) / steps

    def one_update(x, t, rng, truncate):
        sigma, _ = loglinear_sigma(t)
        sigma_next, _ = loglinear_sigma(t - dt)
        dsigma = sigma - sigma_next
        log_score = module.apply(
            variables, x, sigma, valid_mask, method=SEDDModule.score
        )
        probs = analytic_update_probs(log_score, x, dsigma, mask_id, truncate)
        draw = sample_categorical(probs, rng)
        return jnp.where(masked, draw, x)

    def step(carry, i):
        x, rng = carry
        rng, r = jax.random.split(rng)
        x = one_update(x, start_t - row_dt * i, r, truncate=False)
        return (x, rng), ()

    (x, rng), _ = jax.lax.scan(step, (x, rng), jnp.arange(steps - 1))
    rng, r = jax.random.split(rng)
    x = one_update(x, start_t - row_dt * (steps - 1), r, truncate=True)
    return jnp.where(x == mask_id, unk, x)


@register_model("sedd")
class SEDDModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "SEDDModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = SEDDModule(
            vocab_size=vocab or 1004,
            dim=cfg.get("sedd_dim", 512),
            depth=cfg.get("sedd_depth", 8),
            heads=cfg.get("sedd_heads", 8),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("sedd", "sedd_absorb")
def sedd_absorb_arch(cfg: Config):
    cfg.setdefault("sedd_dim", 512)
    cfg.setdefault("sedd_depth", 8)
