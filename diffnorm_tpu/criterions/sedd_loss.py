"""Score-entropy loss for SEDD (reference:
fairseq/tasks/score_entropy_diffusion_task.py + score_model.py loss path):
dsigma-weighted denoising score entropy summed over masked positions,
mean over the batch (score_model.py :1203-1207)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.registry import register_criterion
from diffnorm_tpu.utils.masking import lengths_to_mask


@register_criterion("sedd_loss")
class SEDDLoss:
    # batch-mean loss backwarded verbatim (score_model.py:1203-1207
    # convention; sample_size=nsentences for logging)
    grad_accum = "mean_loss"

    def __init__(self, cfg=None, task=None):
        pass

    def __call__(self, model, variables, batch, rng, train: bool = True):
        tokens = batch["target_unit"]
        lengths = batch["target_lengths"]
        valid = lengths_to_mask(lengths, tokens.shape[1])

        rngs = {"dropout": rng} if train else {}
        r_model, _ = jax.random.split(rng)
        out = model.apply(
            variables, tokens, valid, r_model,
            deterministic=not train, rngs=rngs,
        )
        # reference score_model.py :1203-1207: weighted_loss = dsigma * loss,
        # zeroed at non-noiseable positions (already zeroed inside the
        # model), summed over positions, MEAN over the batch
        per_seq = jnp.sum(out["loss_per_pos"], axis=1)
        ntokens = jnp.maximum(jnp.sum(valid), 1)
        loss = jnp.mean(out["weight"] * per_seq)
        metrics = {
            "loss": loss,
            "n_masked": jnp.mean(out["n_masked"].astype(jnp.float32)),
            "ntokens": ntokens,
            "nsentences": tokens.shape[0],
            "sample_size": tokens.shape[0],
        }
        return loss, metrics, {}
