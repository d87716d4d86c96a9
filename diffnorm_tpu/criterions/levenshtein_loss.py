"""Levenshtein-transformer criterion: deletion CE + insertion-count CE +
masked word CE (reference LabelSmoothedDualImitationCriterion used by LevT).

The task prepares on the host (via the native edit-path op):
* prev_del  — a corrupted canvas to score for deletion
* del_target — per-position keep(0)/delete(1)
* prev_ins  — the kept subsequence with unk placeholders inserted
* ins_target — insertion counts per adjacent slot (clipped to 255)
* target    — gold tokens aligned with prev_ins (for the word head)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.criterions.label_smoothing import label_smoothed_nll_loss
from diffnorm_tpu.registry import register_criterion

PAD, UNK = 1, 3


@register_criterion("levenshtein_loss")
class LevenshteinLoss:
    def __init__(self, cfg=None, task=None):
        self.eps = cfg.get("label_smoothing", 0.1) if cfg is not None else 0.1

    def __call__(self, model, variables, batch, rng, train: bool = True):
        rngs = {"dropout": rng} if train else {}
        out = model.apply(
            variables,
            batch["src_tokens"], batch["src_lengths"],
            batch["prev_del"], batch["prev_kept"], batch["prev_ins"],
            deterministic=not train, rngs=rngs,
        )

        # deletion CE over non-pad positions of prev_del
        del_lp = jax.nn.log_softmax(out["del_logits"].astype(jnp.float32), -1)
        del_valid = batch["prev_del"] != PAD
        del_nll = -jnp.take_along_axis(
            del_lp, batch["del_target"][..., None].astype(jnp.int32), -1
        )[..., 0]
        del_loss = jnp.sum(jnp.where(del_valid, del_nll, 0.0))

        # insertion-count CE over slots (slot j between prev_ins kept tokens)
        ins_lp = jax.nn.log_softmax(out["ins_logits"].astype(jnp.float32), -1)
        ins_tgt = jnp.clip(batch["ins_target"][:, : ins_lp.shape[1]], 0,
                           ins_lp.shape[-1] - 1)
        ins_valid = batch["ins_valid"][:, : ins_lp.shape[1]]
        ins_nll = -jnp.take_along_axis(
            ins_lp, ins_tgt[..., None].astype(jnp.int32), -1
        )[..., 0]
        ins_loss = jnp.sum(jnp.where(ins_valid, ins_nll, 0.0))

        # word CE at placeholder positions of prev_ins
        word_lp = jax.nn.log_softmax(out["word_logits"].astype(jnp.float32), -1)
        word_mask = batch["prev_ins"] == UNK
        flat_lp = word_lp.reshape(-1, word_lp.shape[-1])
        flat_tgt = batch["target"].reshape(-1)
        word_sum, word_nll = label_smoothed_nll_loss(
            jnp.where(word_mask.reshape(-1)[:, None], flat_lp, 0.0),
            jnp.where(word_mask.reshape(-1), flat_tgt, PAD),
            self.eps, ignore_index=PAD,
        )

        ntokens = jnp.maximum(jnp.sum(batch["target"] != PAD), 1)
        loss = (del_loss + ins_loss + word_sum) / ntokens
        metrics = {
            "loss": loss,
            "del_loss": del_loss / ntokens,
            "ins_loss": ins_loss / ntokens,
            "word_loss": word_sum / ntokens,
            "ntokens": ntokens,
            "nsentences": batch["src_tokens"].shape[0],
            "sample_size": ntokens,
        }
        return loss, metrics, {}
