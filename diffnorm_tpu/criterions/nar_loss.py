"""NAR speech-to-unit criterion: masked-position label-smoothed CE + length CE.

Parity with fairseq/criterions/nar_speech_to_unit.py:125-220: unit CE is
computed only at CMLM-masked positions (prev==unk), the 256-way length
classifier gets its own label-smoothed CE (same eps, ignore_index=pad=1 — the
fairseq quirk where a target length of exactly 1 is ignored), the sum is
normalized by ntokens (sentence_avg off in the recipes).

In place of boolean gathering (dynamic shapes), masked positions contribute
via a multiplicative mask — identical sums, jit-static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.registry import register_criterion

PAD = 1


def _masked_label_smoothed_ce(lprobs, target, mask, epsilon: float):
    """Sum of label-smoothed CE over positions where mask is True.
    lprobs: [..., V], target/mask: [...]. Returns (loss_sum, nll_sum)."""
    vocab = lprobs.shape[-1]
    nll = -jnp.take_along_axis(lprobs, target[..., None].astype(jnp.int32), axis=-1)[
        ..., 0
    ]
    smooth = -jnp.sum(lprobs, axis=-1)
    keep = mask & (target != PAD)
    nll = jnp.where(keep, nll, 0.0)
    smooth = jnp.where(keep, smooth, 0.0)
    eps_i = epsilon / (vocab - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    return jnp.sum(loss), jnp.sum(nll)


def apply_multitask_losses(multitask, out, batch, loss, metrics, ntokens):
    """--multitask-config-yaml aux losses (reference get_multitask_loss,
    research/TranSpeech/criterion.py:44-94 / speech_to_speech_criterion.py:65-125):
    total += weight * task_loss where task_loss is the per-task SUM (CTC or
    label-smoothed CE), normalized here by the main ntokens to match the
    trainer's sum-loss/sum-sample_size semantics. Shared by the NAR
    (nar_speech_to_unit) and AR (speech_to_unit) criterions. Returns the
    augmented loss; per-task means are added to `metrics` in place."""
    for name, tc in multitask.items():
        mt_out = out.get("multitask", {}).get(name)
        mt_batch = batch.get("multitask", {}).get(name)
        if mt_out is None or mt_batch is None:
            continue
        weight = mt_batch.get("loss_weight", 1.0)
        mt_tgt = mt_batch["target"]
        logits32 = mt_out["logits"].astype(jnp.float32)
        if tc.decoder_type == "ctc":
            import optax

            logit_mask = mt_out["mask"]
            logit_lens = jnp.sum(logit_mask, axis=1)
            tgt_lens = jnp.sum(mt_tgt != PAD, axis=1)
            per_seq = optax.ctc_loss(
                logits32,
                (~logit_mask).astype(jnp.float32),
                mt_tgt,
                (mt_tgt == PAD).astype(jnp.float32),
                blank_id=0,
            )
            # zero_infinity (fairseq ctc.py): drop infeasible alignments
            feasible = (tgt_lens <= logit_lens) & jnp.isfinite(per_seq)
            if tc.zero_infinity:
                per_seq = jnp.where(feasible, per_seq, 0.0)
            task_loss = jnp.sum(per_seq)
        else:
            mt_lprobs = jax.nn.log_softmax(logits32, axis=-1)
            task_loss, _ = _masked_label_smoothed_ce(
                mt_lprobs, mt_tgt, mt_tgt != PAD, tc.label_smoothing
            )
        loss = loss + weight * task_loss / ntokens
        metrics[f"multitask_{name}_loss"] = task_loss / jnp.maximum(
            jnp.sum(mt_tgt != PAD), 1
        )
    return loss


@register_criterion("nar_speech_to_unit")
class NARSpeechToUnitLoss:
    def __init__(self, cfg=None, task=None):
        self.eps = cfg.get("label_smoothing", 0.2) if cfg is not None else 0.2
        self.ctc_weight = cfg.get("multitask_loss_weight", 1.0) if cfg else 1.0
        # --multitask-config-yaml aux tasks (reference MultitaskCriterion,
        # research/TranSpeech/criterion.py:22-123): per-task criterion knobs
        self.multitask = dict(getattr(task, "multitask_tasks", None) or {})

    def _get_multitask_prev(self, task_name, batch):
        mt = batch.get("multitask", {}).get(task_name, {})
        return mt.get("prev_output_tokens")

    def __call__(self, model, variables, batch, rng, train: bool = True):
        src = batch["src_tokens"]
        src_lengths = batch["src_lengths"]
        prev = batch["prev_target"]
        tgt = batch["target"]
        mt_prev = {
            name: self._get_multitask_prev(name, batch)
            for name in self.multitask
            if self._get_multitask_prev(name, batch) is not None
        } or None
        extra = {}
        if batch.get("tgt_speaker") is not None:
            # --target-speaker-embed conditioning (s2s_transformer.py:38-52)
            extra["tgt_speaker"] = batch["tgt_speaker"]

        if train:
            r_drop, r_cg, r_sp = jax.random.split(rng, 3)
            rngs = {"dropout": r_drop, "cg": r_cg, "sp": r_sp}
            out, mutated = model.apply(
                variables,
                src,
                src_lengths,
                prev,
                tgt_tokens=tgt,
                deterministic=False,
                rngs=rngs,
                mutable=["batch_stats"],
                multitask_prev=mt_prev,
                **extra,
            )
        else:
            out = model.apply(
                variables, src, src_lengths, prev, tgt_tokens=tgt,
                deterministic=True, multitask_prev=mt_prev, **extra,
            )
            mutated = {}

        lprobs = jax.nn.log_softmax(out["logits"].astype(jnp.float32), axis=-1)
        wmask = out["word_ins_mask"]
        if lprobs.ndim == 4:  # stacked: [B, T] canvas mask over [B, T, k]
            wmask = wmask[..., None]
        ce_sum, nll_sum = _masked_label_smoothed_ce(
            lprobs, tgt, wmask, self.eps
        )

        len_lprobs = jax.nn.log_softmax(
            out["length_logits"].astype(jnp.float32), axis=-1
        )
        len_sum, len_nll_sum = _masked_label_smoothed_ce(
            len_lprobs,
            out["length_tgt"],
            jnp.ones_like(out["length_tgt"], dtype=bool),
            self.eps,
        )

        ntokens = jnp.maximum(jnp.sum(tgt != PAD), 1)
        loss = (ce_sum + len_sum) / ntokens

        # optional multitask CTC over encoder states (reference
        # MultitaskCriterion + CtcCriterion, nar_speech_to_unit.py:22-123)
        ctc_loss = None
        if "ctc_logits" in out and "ctc_target" in batch:
            import optax

            logit_lens = jnp.sum(out["ctc_mask"], axis=1)
            logit_pad = (~out["ctc_mask"]).astype(jnp.float32)
            tgt_pad = (batch["ctc_target"] == PAD).astype(jnp.float32)
            per_seq = optax.ctc_loss(
                out["ctc_logits"].astype(jnp.float32), logit_pad,
                batch["ctc_target"], tgt_pad, blank_id=0,
            )
            ctc_loss = jnp.mean(per_seq)
            loss = loss + self.ctc_weight * ctc_loss

        pred = jnp.argmax(lprobs, axis=-1)
        keep = wmask & (tgt != PAD)
        n_correct = jnp.sum((pred == tgt) & keep)
        total = jnp.maximum(jnp.sum(keep), 1)

        metrics = {
            "loss": loss,
            "nll_loss": nll_sum / ntokens,
            "loss_length": len_sum / ntokens,
            "acc": n_correct / total,
            "ntokens": ntokens,
            "nsentences": src.shape[0],
            "sample_size": ntokens,
        }
        if ctc_loss is not None:
            metrics["ctc_loss"] = ctc_loss

        loss = apply_multitask_losses(
            self.multitask, out, batch, loss, metrics, ntokens
        )
        if self.multitask:
            metrics["loss"] = loss
        return loss, metrics, mutated
