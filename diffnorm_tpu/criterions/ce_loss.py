"""Generic label-smoothed cross-entropy criterion for AR models
(reference: fairseq/criterions/label_smoothed_cross_entropy.py)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.criterions.label_smoothing import label_smoothed_nll_loss
from diffnorm_tpu.registry import register_criterion

PAD = 1


@register_criterion("label_smoothed_cross_entropy")
class LabelSmoothedCrossEntropy:
    def __init__(self, cfg=None, task=None):
        self.eps = cfg.get("label_smoothing", 0.1) if cfg is not None else 0.1

    def _model_kwargs(self, batch):
        """Extra kwargs for the model forward (subclass hook)."""
        return {}

    def _finalize(self, out, batch, loss, metrics, ntokens):
        """Post-main-loss hook (subclass hook). Returns the final loss;
        may add metrics in place."""
        return loss

    def __call__(self, model, variables, batch, rng, train: bool = True):
        src = batch["src_tokens"]
        src_lengths = batch["src_lengths"]
        prev = batch["prev_output_tokens"]
        tgt = batch["target"]
        kwargs = self._model_kwargs(batch)
        if batch.get("tgt_speaker") is not None:
            # --target-speaker-embed conditioning (only S2S datasets emit it;
            # the S2UT modules accept the kwarg)
            kwargs["tgt_speaker"] = batch["tgt_speaker"]

        if train:
            out, mutated = model.apply(
                variables, src, src_lengths, prev, deterministic=False,
                rngs={"dropout": rng}, mutable=["batch_stats"], **kwargs,
            )
        else:
            out = model.apply(
                variables, src, src_lengths, prev, deterministic=True,
                **kwargs,
            )
            mutated = {}

        lprobs = jax.nn.log_softmax(out["logits"].astype(jnp.float32), axis=-1)
        flat = lprobs.reshape(-1, lprobs.shape[-1])
        flat_tgt = tgt.reshape(-1)
        loss_sum, nll_sum = label_smoothed_nll_loss(
            flat, flat_tgt, self.eps, ignore_index=PAD
        )
        ntokens = jnp.maximum(jnp.sum(tgt != PAD), 1)
        loss = loss_sum / ntokens

        pred = jnp.argmax(flat, axis=-1)
        keep = flat_tgt != PAD
        metrics = {
            "loss": loss,
            "nll_loss": nll_sum / ntokens,
            "acc": jnp.sum((pred == flat_tgt) & keep) / ntokens,
            "ntokens": ntokens,
            "nsentences": src.shape[0],
            "sample_size": ntokens,
        }
        loss = self._finalize(out, batch, loss, metrics, ntokens)
        metrics["loss"] = loss
        return loss, metrics, mutated


@register_criterion("speech_to_unit")
class SpeechToUnitLoss(LabelSmoothedCrossEntropy):
    """AR S2UT criterion with --multitask-config-yaml aux losses (reference
    SpeechToUnitMultitaskTaskCriterion, speech_to_speech_criterion.py:159-225:
    label-smoothed CE on the unit decoder + weighted per-task CTC/CE aux
    losses tapping encoder/decoder states)."""

    def __init__(self, cfg=None, task=None):
        super().__init__(cfg, task)
        self.multitask = dict(getattr(task, "multitask_tasks", None) or {})

    def _model_kwargs(self, batch):
        if not self.multitask:
            return {}
        mt_prev = {
            name: batch.get("multitask", {}).get(name, {}).get(
                "prev_output_tokens")
            for name in self.multitask
        }
        mt_prev = {k: v for k, v in mt_prev.items() if v is not None} or None
        # tgt_tokens gates the aux heads on (train/valid only, never in
        # generation) — same convention as the NAR model
        return dict(tgt_tokens=batch["target"], multitask_prev=mt_prev)

    def _finalize(self, out, batch, loss, metrics, ntokens):
        from diffnorm_tpu.criterions.nar_loss import apply_multitask_losses

        return apply_multitask_losses(
            self.multitask, out, batch, loss, metrics, ntokens
        )


@register_criterion("speech_to_unit_2pass")
class SpeechToUnit2PassLoss(SpeechToUnitLoss):
    """UnitY two-pass criterion (reference
    SpeechToUnit2passMultitaskTaskCriterion,
    speech_to_speech_criterion.py:258-330): the model forward additionally
    takes the first-pass task's prev_output_tokens; the first-pass loss
    arrives through the regular multitask accounting (the model emits that
    task's logits from its mt_decoder)."""

    def __init__(self, cfg=None, task=None):
        super().__init__(cfg, task)
        self.mt_task_name = getattr(task, "mt_task_name", None)
        assert self.mt_task_name, (
            "speech_to_unit_2pass needs a first-pass decoder multitask"
        )

    def _model_kwargs(self, batch):
        kw = super()._model_kwargs(batch) or {}
        kw["prev_tokens_mt"] = (
            batch["multitask"][self.mt_task_name]["prev_output_tokens"]
        )
        # the two-pass forward always needs tgt gating intact even without
        # extra aux heads
        kw.setdefault("tgt_tokens", batch["target"])
        kw.setdefault("multitask_prev", None)
        return kw


@register_criterion("lm_cross_entropy")
class LMCrossEntropy:
    """Next-token CE for the decoder-only unit LM (reference cross_entropy
    criterion + eval_lm scoring convention: eos-fronted shift)."""

    def __init__(self, cfg=None, task=None):
        self.eps = cfg.get("label_smoothing", 0.0) if cfg is not None else 0.0

    def __call__(self, model, variables, batch, rng, train: bool = True):
        tokens = batch["target_unit"]
        EOS = 2
        prev = jnp.concatenate(
            [jnp.full((tokens.shape[0], 1), EOS, tokens.dtype),
             tokens[:, :-1]], axis=1,
        )
        rngs = {"dropout": rng} if train else {}
        logits = model.apply(
            variables, prev, deterministic=not train, rngs=rngs
        )
        lprobs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        flat = lprobs.reshape(-1, lprobs.shape[-1])
        flat_tgt = tokens.reshape(-1)
        loss_sum, nll_sum = label_smoothed_nll_loss(
            flat, flat_tgt, self.eps, ignore_index=PAD
        )
        ntokens = jnp.maximum(jnp.sum(tokens != PAD), 1)
        loss = loss_sum / ntokens
        metrics = {
            "loss": loss,
            "nll_loss": nll_sum / ntokens,
            "ppl": jnp.exp(nll_sum / ntokens),
            "ntokens": ntokens,
            "nsentences": tokens.shape[0],
            "sample_size": ntokens,
        }
        return loss, metrics, {}
