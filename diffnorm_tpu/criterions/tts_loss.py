"""TTS criterions (reference: fairseq/criterions/tacotron2_loss.py and
fairseq/criterions/fastspeech2_loss.py) wired for the trainer's
(loss, metrics, mutated_model_state) contract.

`tacotron2_loss` drives the AR tts_transformer (teacher-forced prev feats +
masked L1/MSE on pre- and post-net features + eos BCE, via
models.tts_transformer.tts_loss); `fastspeech2_loss` drives FastSpeech2
(masked L1 on mel + postnet mel, MSE on log-duration/pitch/energy over
valid source tokens).
"""

from __future__ import annotations

import jax.numpy as jnp

from diffnorm_tpu.registry import register_criterion

PAD = 1


@register_criterion("tacotron2_loss")
class Tacotron2Loss:
    # the reference backwards the mean-reduced loss verbatim
    # (tacotron2_loss.py reduction="mean"; fairseq trainer multiply_grads
    # by 1/sample_size) — see train/trainer.py grad_accum conventions
    grad_accum = "mean_loss"

    def __init__(self, cfg=None, task=None):
        self.bce_pos_weight = (
            cfg.get("bce_pos_weight", 5.0) if cfg is not None else 5.0
        )

    def _model_kwargs(self, batch):
        """Extra kwargs for the model forward (subclass hook)."""
        return {}

    def _finalize(self, out, batch, loss, metrics, sample_size):
        """Post-main-loss hook (subclass hook). Returns the final loss;
        may add metrics in place."""
        return loss

    def __call__(self, model, variables, batch, rng, train: bool = True):
        from diffnorm_tpu.models.tts_transformer import tts_loss

        # the Tacotron prenet applies dropout unconditionally (including at
        # inference), so the dropout rng is needed in valid passes too
        kw = dict(rngs={"dropout": rng})
        mutated = {}
        if train and "batch_stats" in variables:  # postnet/encoder BN
            kw["mutable"] = ["batch_stats"]
        out = model.module.apply(
            variables,
            jnp.asarray(batch["src_tokens"]),
            jnp.asarray(batch["src_lengths"]),
            jnp.asarray(batch["prev_feats"]),
            jnp.asarray(batch["tgt_mask"]),
            deterministic=not train,
            **kw,
            **self._model_kwargs(batch),
        )
        if "mutable" in kw:
            out, mutated = out
        loss, metrics = tts_loss(
            out, jnp.asarray(batch["feat_tgt"]),
            jnp.asarray(batch["tgt_lengths"]),
            bce_pos_weight=self.bce_pos_weight,
        )
        n = batch["src_tokens"].shape[0]
        ntokens = jnp.sum(jnp.asarray(batch["tgt_lengths"]))
        # sample_size = ntokens (reference tacotron2_loss.py:155 with the
        # recipes' sentence_avg=False) — weights both the grad denominator
        # and the logged-metric aggregation like the reference
        metrics.update(ntokens=ntokens, nsentences=n, sample_size=ntokens)
        loss = self._finalize(out, batch, loss, metrics, ntokens)
        metrics["loss"] = loss
        return loss, metrics, mutated


@register_criterion("speech_to_spectrogram_2pass")
class SpeechToSpectrogram2PassLoss(Tacotron2Loss):
    """Translatotron2 criterion (reference
    SpeechToSpectrogram2passMultitaskTaskCriterion,
    speech_to_speech_criterion.py:434-520): Tacotron2 losses on the mel
    decoder + the model forward additionally takes the first-pass task's
    prev_output_tokens; the first-pass loss arrives through the regular
    multitask accounting (the model emits that task's logits from its
    mt_decoder). Aux task SUMS add onto the mean-reduced main loss verbatim
    (reference :500-506 `loss += multitask_loss` — the mixed mean+sum
    assembly is a reference quirk kept for trajectory parity)."""

    def __init__(self, cfg=None, task=None):
        super().__init__(cfg, task)
        self.multitask = dict(getattr(task, "multitask_tasks", None) or {})
        self.mt_task_name = getattr(task, "mt_task_name", None)
        assert self.mt_task_name, (
            "speech_to_spectrogram_2pass needs a first-pass decoder "
            "multitask (is_first_pass_decoder in --multitask-config-yaml)"
        )

    def _model_kwargs(self, batch):
        mt_prev = {
            name: batch.get("multitask", {}).get(name, {}).get(
                "prev_output_tokens")
            for name in self.multitask
        }
        mt_prev = {k: v for k, v in mt_prev.items() if v is not None} or None
        return dict(
            prev_tokens_mt=(
                batch["multitask"][self.mt_task_name]["prev_output_tokens"]),
            # tgt_tokens gates the aux heads on (train/valid only, never in
            # generation) — same convention as the NAR/AR unit models
            tgt_tokens=batch["feat_tgt"],
            multitask_prev=mt_prev,
        )

    def _finalize(self, out, batch, loss, metrics, sample_size):
        from diffnorm_tpu.criterions.nar_loss import apply_multitask_losses

        # denominator 1: raw weighted task sums, exactly the reference's
        # `loss += multitask_loss`
        return apply_multitask_losses(
            self.multitask, out, batch, loss, metrics, 1.0
        )


@register_criterion("fastspeech2_loss")
class FastSpeech2Loss:
    """Masked L1 on both mel heads + MSE on log(1+duration), pitch and
    energy over valid source tokens (reference fastspeech2_loss.py)."""

    # reference backwards the mean loss; sample_size = nsentences
    # (fastspeech2_loss.py:89) is for logging + the grad denominator
    grad_accum = "mean_loss"

    def __init__(self, cfg=None, task=None):
        pass

    def __call__(self, model, variables, batch, rng, train: bool = True):
        durations = jnp.asarray(batch["durations"])
        pitches = jnp.asarray(batch["pitches"]).astype(jnp.float32)
        energies = jnp.asarray(batch["energies"]).astype(jnp.float32)
        kw = dict(rngs={"dropout": rng}) if train else {}
        out = model.module.apply(
            variables, jnp.asarray(batch["src_tokens"]),
            durations=durations, pitches=pitches, energies=energies,
            deterministic=not train, **kw,
        )

        feat_tgt = jnp.asarray(batch["feat_tgt"]).astype(jnp.float32)
        b, t, d = feat_tgt.shape
        tgt_mask = jnp.arange(t)[None, :] < jnp.asarray(
            batch["tgt_lengths"])[:, None]
        denom = jnp.maximum(jnp.sum(tgt_mask), 1) * d

        def masked_l1(pred):
            diff = jnp.abs(pred[:, :t].astype(jnp.float32) - feat_tgt)
            return jnp.sum(jnp.where(tgt_mask[..., None], diff, 0.0)) / denom

        l1 = masked_l1(out["mel"]) + masked_l1(out["mel_post"])

        src_valid = jnp.asarray(batch["src_tokens"]) != PAD
        n_src = jnp.maximum(jnp.sum(src_valid), 1)

        def masked_mse(pred, tgt):
            sq = jnp.square(pred.astype(jnp.float32) - tgt)
            return jnp.sum(jnp.where(src_valid, sq, 0.0)) / n_src

        dur_loss = masked_mse(out["log_dur"],
                              jnp.log1p(durations.astype(jnp.float32)))
        pitch_loss = masked_mse(out["pitch"], pitches)
        energy_loss = masked_mse(out["energy"], energies)

        loss = l1 + dur_loss + pitch_loss + energy_loss
        metrics = {
            "loss": loss, "l1_loss": l1, "dur_loss": dur_loss,
            "pitch_loss": pitch_loss, "energy_loss": energy_loss,
            "ntokens": jnp.sum(jnp.asarray(batch["tgt_lengths"])),
            "nsentences": b, "sample_size": b,
        }
        return loss, metrics, {}
