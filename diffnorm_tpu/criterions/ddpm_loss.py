"""DiffNorm latent-diffusion training loss.

Parity with reference LatentDiscreteModel.forward loss assembly
(latent_module.py:1563-1613) + DDPMDiscreteLoss (ddpm_discrete_loss.py:37-75):

* noise MSE: elementwise MSE zeroed outside the target mask, mean over (T, C)
  per sequence (including zeros — matching torch `reduce('b ... -> b','mean')`),
  min-SNR-5 weighted, batch mean
* multitask reconstruction: 50 * masked-mean MSE on decoded features +
  label-smoothed NLL (eps=0.1, ignore_index=0) normalized by unit count
* total = noise_mse + recon / timesteps, sample_size = nsentences
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from diffnorm_tpu.criterions.label_smoothing import (
    label_smoothed_nll_loss,
    unit_accuracy,
)
from diffnorm_tpu.registry import register_criterion
from diffnorm_tpu.utils.masking import lengths_to_mask


@register_criterion("ddpm_discrete_loss")
class DDPMDiscreteLoss:
    # reference backwards the normalized loss verbatim
    # (ddpm_discrete_loss.py:59-64, sample_size=nsentences) — trainer.py
    # grad_accum conventions
    grad_accum = "mean_loss"

    def __init__(self, cfg=None, task=None):
        self.eps = 0.1
        self.recon_mse_weight = 50.0

    def assemble(self, out, feature, units, mask, timesteps: int,
                 multitask: bool):
        """Assemble the DiffNorm multitask loss from a training-forward
        output dict (reference latent_module.py:1563-1613). Split out of
        __call__ so parity tests can drive it on a noise-injected forward."""
        # --- min-SNR weighted noise MSE -----------------------------------
        diff = out["pred_noise"].astype(jnp.float32) - out["true_noise"].astype(
            jnp.float32
        )
        sq = jnp.square(diff)
        sq = jnp.where(mask[..., None], sq, 0.0)
        per_seq = jnp.mean(sq, axis=(1, 2))  # mean over full T*C (zeros incl.)
        noise_mse = jnp.mean(per_seq * out["loss_weight"])

        # --- multitask reconstruction -------------------------------------
        recon = out["recon_feature"].astype(jnp.float32)
        sqr = jnp.square(recon - feature.astype(jnp.float32))
        n_valid = jnp.maximum(jnp.sum(mask) * feature.shape[-1], 1)
        recon_mse = jnp.sum(jnp.where(mask[..., None], sqr, 0.0)) / n_valid

        lprobs = jax.nn.log_softmax(
            out["lm_logits"].astype(jnp.float32), axis=-1
        ).reshape(-1, out["lm_logits"].shape[-1])
        flat_units = units.reshape(-1)
        ce_sum, _ = label_smoothed_nll_loss(
            lprobs, flat_units, self.eps, ignore_index=0
        )
        n_correct, total = unit_accuracy(lprobs, flat_units, ignore_index=0)
        ntokens = jnp.maximum(jnp.sum(flat_units != 0), 1)
        smooth_loss = ce_sum / ntokens
        recon_loss = self.recon_mse_weight * recon_mse + smooth_loss

        if multitask:
            loss = noise_mse + recon_loss / timesteps
        else:
            loss = noise_mse

        metrics = {
            "loss": loss,
            "noise_loss": noise_mse,
            "recon_mse_loss": recon_mse,
            "nll_loss": smooth_loss,
            "acc": n_correct / jnp.maximum(total, 1),
            "ntokens": ntokens,
            "nsentences": feature.shape[0],
            "sample_size": feature.shape[0],
        }
        return loss, metrics

    def __call__(self, model, variables, batch, rng, train: bool = True):
        feature = batch["reduce_target"]
        units = batch["reduce_target_unit"]
        lengths = batch["reduce_target_lengths"]
        mask = lengths_to_mask(lengths, feature.shape[1])

        r_model, r_drop = jax.random.split(rng)
        extra = {}
        # injected draws (trajectory-parity tests share the reference's
        # stream): diffusion times + posterior / beta_0-jitter / q-sample eps
        for key in ("times", "enc_noise", "x1_noise", "q_noise"):
            if batch.get(f"inject_{key}") is not None:
                extra[key] = batch[f"inject_{key}"]
        out = model.apply(
            variables, feature, mask, r_model,
            deterministic=not train,
            rngs={"dropout": r_drop}, **extra,
        )
        loss, metrics = self.assemble(
            out, feature, units, mask, model.module.timesteps,
            model.module.multitask,
        )
        return loss, metrics, {}


@register_criterion("ddpm_latent_loss")
class DDPMLatentLoss:
    """Continuous diffusion criterion (reference ddpm_latent_loss.py /
    ddpm_loss.py): min-SNR weighted noise MSE only — used by the
    `speech_diffusion` / `speech_diffusion_hubert` tasks."""

    grad_accum = "mean_loss"  # ddpm_latent_loss.py:69 sample_size=nsentences

    def __init__(self, cfg=None, task=None):
        pass

    def __call__(self, model, variables, batch, rng, train: bool = True):
        feature = batch["reduce_target"]
        lengths = batch["reduce_target_lengths"]
        mask = lengths_to_mask(lengths, feature.shape[1])

        r_model, r_drop = jax.random.split(rng)
        out = model.apply(
            variables, feature, mask, r_model,
            deterministic=not train,
            rngs={"dropout": r_drop},
        )
        diff = out["pred_noise"].astype(jnp.float32) - out["true_noise"].astype(
            jnp.float32
        )
        sq = jnp.where(mask[..., None], jnp.square(diff), 0.0)
        per_seq = jnp.mean(sq, axis=(1, 2))
        loss = jnp.mean(per_seq * out["loss_weight"])
        metrics = {
            "loss": loss,
            "ntokens": jnp.sum(lengths),
            "nsentences": feature.shape[0],
            "sample_size": feature.shape[0],
        }
        return loss, metrics, {}
