"""Score-entropy discrete diffusion (SEDD) over unit sequences.

Capability parity with the reference's discrete-diffusion alternative to
CMLM (fairseq/models/score_entropy/{score_model.py, graph.py, noise.py,
sampling_utils.py}, tasks "sedd"/"sedd_lm"): absorbing-state graph with a
log-linear noise schedule, a time-conditioned transformer scoring network,
the denoising score-entropy objective, and Euler / analytic reverse
sampling — all as jit-compiled graphs (the reverse sampler is one lax.scan).

Math (Lou et al., "Discrete Diffusion Modeling by Estimating the Ratios of
the Data Distribution"):
* absorbing graph: tokens independently jump to MASK with prob
  1 - exp(-sigma(t)); sigma loglinear: sigma(t) = -log(1 - (1-eps) t)
* the network outputs per-position log-score ratios s_theta(x)[v] ~
  log(p(..v..)/p(..MASK..)); DWDSE loss on masked positions:
  sum_v exp(s_v) - s_y + const  (y = clean token)
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
    """sigma(t) and its derivative; t in (0, 1]."""
    sigma = -jnp.log1p(-(1 - eps) * t)
    dsigma = (1 - eps) / (1 - (1 - eps) * t)
    return sigma, dsigma


class SEDDScoreModel(nn.Module):
    """Time-conditioned transformer over (possibly masked) token sequences.
    The MASK (absorbing) state is the last vocab index."""

    vocab_size: int  # includes the absorbing MASK state
    dim: int = 512
    depth: int = 8
    heads: int = 8
    dim_head: int = 64
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
        # the score of staying in the current state is identically 0
        return logits - jnp.take_along_axis(logits, tokens[..., None], axis=-1)


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

    def perturb(self, tokens, t, rng):
        """Absorbing forward process: mask each token w.p. 1-exp(-sigma)."""
        sigma, _ = loglinear_sigma(t)
        p_mask = 1.0 - jnp.exp(-sigma)[:, None]
        drop = jax.random.uniform(rng, tokens.shape) < p_mask
        return jnp.where(drop, self.mask_id, tokens)

    def __call__(self, tokens, valid_mask, rng, deterministic: bool = True):
        """Training: sample t ~ U(eps, 1), perturb, score, DWDSE loss parts.

        Returns dict(loss_per_pos [B, T], weight [B], x_t)."""
        b = tokens.shape[0]
        r_t, r_p = jax.random.split(rng)
        t = jax.random.uniform(r_t, (b,), minval=1e-3, maxval=1.0)
        sigma, dsigma = loglinear_sigma(t)
        x_t = self.perturb(tokens, t, r_p)
        scores = self.score_model(
            x_t, sigma, mask=valid_mask, deterministic=deterministic
        )
        is_masked = x_t == self.mask_id
        # DWDSE on masked positions: sum_v!=MASK exp(s_v) - s_y
        exp_sum = jnp.sum(
            jnp.exp(scores.astype(jnp.float32))[..., : self.vocab_size], axis=-1
        )
        s_y = jnp.take_along_axis(
            scores.astype(jnp.float32), tokens[..., None], axis=-1
        )[..., 0]
        per_pos = jnp.where(is_masked & valid_mask, exp_sum - s_y, 0.0)
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
):
    """Reverse sampling from all-MASK via analytic absorbing-state updates,
    one lax.scan (reference sampling_utils.py Euler/analytic sampler).

    At each step from t to t-dt, a masked position unmasks with probability
    (exp(dsigma*dt-ish) factor); token drawn from softmax of scores.
    """
    module = model.module
    mask_id = module.vocab_size
    tokens = jnp.full((batch_size, seq_len), mask_id, jnp.int32)
    if valid_mask is None:
        valid_mask = jnp.ones((batch_size, seq_len), bool)

    ts = jnp.linspace(1.0, 1e-3, steps + 1)

    def step(carry, i):
        tokens, rng = carry
        t, t_next = ts[i], ts[i + 1]
        sigma, _ = loglinear_sigma(jnp.full((batch_size,), t))
        sigma_next, _ = loglinear_sigma(jnp.full((batch_size,), t_next))
        scores = module.apply(
            variables, tokens, sigma, valid_mask, method=SEDDModule.score
        ).astype(jnp.float32)
        # unmask probability for this step (absorbing analytic form)
        p_unmask = 1.0 - jnp.exp(-(sigma - sigma_next))[:, None]
        rng, r_u, r_c = jax.random.split(rng, 3)
        do_unmask = (
            (jax.random.uniform(r_u, tokens.shape) < p_unmask)
            & (tokens == mask_id) & valid_mask
        )
        cat_logits = scores[..., : module.vocab_size]
        draws = jax.random.categorical(r_c, cat_logits, axis=-1).astype(jnp.int32)
        tokens = jnp.where(do_unmask, draws, tokens)
        return (tokens, rng), ()

    (tokens, _), _ = jax.lax.scan(step, (tokens, rng), jnp.arange(steps))
    # any straggler masks resolve greedily at the end
    sigma0, _ = loglinear_sigma(jnp.full((batch_size,), 1e-3))
    scores = module.apply(
        variables, tokens, sigma0, valid_mask, method=SEDDModule.score
    )
    final_draw = jnp.argmax(scores[..., : module.vocab_size], axis=-1).astype(
        jnp.int32
    )
    return jnp.where(tokens == mask_id, final_draw, tokens)


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
