"""Reference criterion-name aliases.

fairseq registers several criterions under names the recipes and docs use
directly; where this framework already implements the same semantics under
a different name, the reference name is registered here so `--criterion`
flags from reference workflows resolve unchanged:

* `cross_entropy` (fairseq/criterions/cross_entropy.py) — plain CE, i.e.
  label-smoothed CE with epsilon 0 unless --label-smoothing is given.
* `tacotron2` / `fastspeech2` (fairseq/criterions/tacotron2_loss.py:198,
  fastspeech2_loss.py:125) — our tacotron2_loss / fastspeech2_loss.
* `nat_loss` (fairseq/criterions/nat_loss.py, the generic NAT dual-imitation
  criterion used by both levenshtein_transformer and cmlm_transformer
  recipes) — dispatches on the arch: LevT canvases get the deletion/
  insertion/word criterion, mask-predict models the masked-CE criterion.
"""

from __future__ import annotations

from diffnorm_tpu.criterions.ce_loss import LabelSmoothedCrossEntropy
from diffnorm_tpu.criterions.ddpm_loss import DDPMDiscreteLoss, DDPMLatentLoss
from diffnorm_tpu.criterions.levenshtein_loss import LevenshteinLoss
from diffnorm_tpu.criterions.nar_loss import NARSpeechToUnitLoss
from diffnorm_tpu.criterions.tts_loss import FastSpeech2Loss, Tacotron2Loss
from diffnorm_tpu.registry import CRITERIONS, register_criterion


@register_criterion("cross_entropy")
class CrossEntropy(LabelSmoothedCrossEntropy):
    """Reference `cross_entropy`: no smoothing by default."""

    def __init__(self, cfg=None, task=None):
        super().__init__(cfg, task)
        if cfg is None or "label_smoothing" not in cfg:
            self.eps = 0.0


@register_criterion("nat_loss")
class NatLoss:
    """Arch-dispatching stand-in for fairseq's generic nat_loss."""

    def __new__(cls, cfg=None, task=None):
        arch = str(cfg.get("arch", "")) if cfg is not None else ""
        if "levenshtein" in arch:
            return LevenshteinLoss(cfg, task)
        return NARSpeechToUnitLoss(cfg, task)


CRITERIONS.register("tacotron2", Tacotron2Loss)
CRITERIONS.register("fastspeech2", FastSpeech2Loss)
# speech_to_spectrogram (speech_to_speech_criterion.py:333) IS the
# Tacotron2 criterion applied to the s2spect model (same L1+MSE+eos-BCE
# contract); the 2pass variant (speech_to_spectrogram_2pass) is the
# Translatotron2 criterion registered in criterions/tts_loss.py
CRITERIONS.register("speech_to_spectrogram", Tacotron2Loss)


@register_criterion("ddpm_loss")
class DDPMLossAlias(DDPMLatentLoss):
    """Reference `ddpm_loss` (fairseq/criterions/ddpm_loss.py): the
    continuous-latent noise-prediction objective driven through the IDDPM
    wrapper (`create_diffusion().training_losses` + 0.1x length CE). Our
    continuous diffusion models compute the noise loss in-forward (the
    length head, where configured, is priced by the model output), so the
    reference name maps onto the latent DDPM criterion."""


@register_criterion("speech_decoder_loss")
class SpeechDecoderLossAlias(DDPMDiscreteLoss):
    """Reference `speech_decoder_loss` (fairseq/criterions/
    speech_decoder_loss.py): discrete-diffusion mse + label-smoothed NLL
    (eps 0.2, ignore_index 0) over reduce_target/reduce_target_unit — the
    same loss surface as ddpm_discrete_loss with the reference's 0.2
    smoothing default."""

    def __init__(self, cfg=None, task=None):
        super().__init__(cfg, task)
        self.eps = 0.2  # reference speech_decoder_loss.py:18


@register_criterion("unit_to_speech")
class UnitToSpeechCriterion:
    """Reference `unit_to_speech` (fairseq/criterions/hubert_to_speech.py:57)
    / `repr_to_speech` (repr_to_speech_loss.py:56): the code-HiFi-GAN
    fine-tune loss. The adversarial + feature-matching terms require the
    alternating discriminator state and live in train/gan_trainer.py (the
    fairseq-train CLI dispatches the unit_to_speech / repr_to_speech TASKS
    there); this registered criterion prices the generator-side
    reconstruction surface — 45x log-mel L1 + duration-predictor MSE — the
    terms the reference logs for best-checkpoint keeping.

    model: the CodeGenerator (or a ModelHolder around it); batch: the
    vocoder dataset collation ({code|features}, wav, optional durations)."""

    mel_weight = 45.0

    def __init__(self, cfg=None, task=None):
        self.cfg = cfg
        cfg = cfg or {}
        self.mel_kw = dict(
            n_fft=cfg.get("n_fft", 1024), hop=cfg.get("hop_size", 256),
            win=cfg.get("win_size", 1024), num_mels=cfg.get("num_mels", 80),
            sample_rate=cfg.get("sampling_rate", 16000),
        )

    def __call__(self, model, variables, batch, rng, train: bool = True):
        import jax.numpy as jnp

        from diffnorm_tpu.ops.mel import mel_spectrogram

        gen = getattr(model, "module", model)
        code = batch["features"] if "features" in batch else batch["code"]
        fake = gen.apply(variables, code)
        # Trim both to the shorter signal: dur-predicted expansion (or a
        # short final segment) can make the generated wav longer than the
        # collated one, and mel frames must align for the L1.
        n = min(fake.shape[1], batch["wav"].shape[1])
        real = batch["wav"][:, :n]
        fake = fake[:, :n]
        mel_r = mel_spectrogram(real, **self.mel_kw)
        mel_f = mel_spectrogram(fake, **self.mel_kw)
        mel = jnp.mean(jnp.abs(mel_r - mel_f))
        loss = self.mel_weight * mel
        metrics = {"mel": mel, "nsentences": real.shape[0],
                   "sample_size": real.shape[0]}
        durations = batch.get("durations")
        if durations is not None and getattr(gen, "dur_predictor", False):
            from diffnorm_tpu.models.hifigan import CodeGenerator

            inp = batch.get("dur_code", code)
            log_dur = gen.apply(variables, inp,
                                method=CodeGenerator.log_durations)
            keep = durations != -100  # reference's hard-coded duration mask
            dur_tgt = jnp.log(
                jnp.maximum(durations, 0).astype(jnp.float32) + 1.0)
            sq = jnp.square(log_dur - dur_tgt)
            dur_mse = (jnp.sum(jnp.where(keep, sq, 0.0))
                       / jnp.maximum(jnp.sum(keep), 1))
            loss = loss + dur_mse
            metrics["dur_mse"] = dur_mse
        metrics["loss"] = loss
        return loss, metrics, {}


CRITERIONS.register("repr_to_speech", UnitToSpeechCriterion)
