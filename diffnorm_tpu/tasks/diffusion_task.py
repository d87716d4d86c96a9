"""Latent-diffusion task ("speech_diffusion_discrete" in the reference,
fairseq/tasks/speech_diffusion_discrete_task.py): same data/dictionary as the
VAE task, but the model composes a *frozen* VAE restored from a prior-stage
checkpoint (reference diff_discrete.py:73-79)."""

from __future__ import annotations

from typing import Dict

import jax

from diffnorm_tpu.config import Config
from diffnorm_tpu.registry import register_task
from diffnorm_tpu.tasks.vae_task import SpeechDecoderTask
from diffnorm_tpu.utils.masking import lengths_to_mask

import numpy as np


@register_task("speech_diffusion_discrete")
class SpeechDiffusionDiscreteTask(SpeechDecoderTask):
    # the "vae" subtree of LatentDiffusionModule stays frozen
    frozen_param_keys = ("vae",)

    def init_variables(self, model, rng, batch):
        feature = batch["reduce_target"]
        mask = np.asarray(
            lengths_to_mask(batch["reduce_target_lengths"], feature.shape[1])
        )
        r_p, r_m, r_d = jax.random.split(rng, 3)
        return model.init(
            {"params": r_p, "dropout": r_d},
            feature,
            mask,
            r_m,
            deterministic=True,
        )

    def load_frozen_params(self, frozen: Dict) -> Dict:
        """Restore the frozen VAE weights from `speech_decoder_ckpt`.

        The prior stage saved a TrainState whose `params` tree is the
        SpeechVAEModule root; it maps 1:1 onto our `vae` subtree.
        """
        ckpt = self.cfg.get("speech_decoder_ckpt")
        if not ckpt:
            return frozen
        from diffnorm_tpu.train.checkpoint import load_checkpoint_params

        restored = load_checkpoint_params(ckpt)
        vae_params = restored.get("params", restored)
        return {"vae": vae_params}


@register_task("speech_diffusion")
class SpeechDiffusionTask(SpeechDiffusionDiscreteTask):
    """Continuous latent diffusion (reference speech_diffusion_task.py):
    same data/VAE composition, noise objective only (criterion
    ddpm_latent_loss, arch diff_latent)."""


@register_task("speech_diffusion_hubert")
class SpeechDiffusionHubertTask(SpeechDiffusionDiscreteTask):
    """Feature-space diffusion over raw mHuBERT features (reference
    speech_diffusion_hubert_task.py): no VAE (arch diff_hubert), so nothing
    is frozen."""

    frozen_param_keys = ()

    def load_frozen_params(self, frozen):
        return frozen


@register_task("hubert_vae")
class HubertVAETask(SpeechDecoderTask):
    """HuBERT-feature VAE without the unit LM objective (reference
    hubert_vae_task.py + hubert_vae_loss)."""
