"""GAN trainer for vocoder fine-tuning (code-HiFi-GAN).

Capability parity with the reference's vendored HiFi-GAN training loop
(research/TranSpeech/hifigan/ + fairseq/tasks/code_hifigan.py
"unit_to_speech"): alternating discriminator/generator updates with LSGAN
losses, feature matching (x2), log-mel L1 (x45), and duration-predictor MSE
when the generator carries one. Both steps are single jitted programs; the
two AdamW optimizers follow HiFi-GAN's (0.8, 0.99) betas.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from diffnorm_tpu.models.hifigan_disc import (
    MultiPeriodDiscriminator,
    MultiScaleDiscriminator,
    discriminator_loss,
    feature_matching_loss,
    generator_adv_loss,
)
from diffnorm_tpu.ops.mel import mel_spectrogram


class GanTrainState(struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    d_params: Any
    g_opt: Any
    d_opt: Any


class GanTrainer:
    def __init__(self, generator_module, cfg):
        self.gen = generator_module
        width = cfg.get("disc_width", 1.0)
        # --bf16-disc: bfloat16 discriminator compute (params stay f32;
        # the LSGAN/FM losses mean-reduce in f32 below). The waveform-rate
        # convs are bandwidth-bound — halving the activation bytes measured
        # a real step win on v5e (PERFORMANCE.md "GAN fine-tune MFU").
        ddtype = (jnp.bfloat16 if cfg.get("bf16_disc", False)
                  else jnp.float32)
        self.mpd = MultiPeriodDiscriminator(
            periods=tuple(cfg.get("mpd_periods", (2, 3, 5, 7, 11))),
            width=width, dtype=ddtype,
        )
        self.msd = MultiScaleDiscriminator(
            scales=cfg.get("msd_scales", 3), width=width, dtype=ddtype,
        )
        self.cfg = cfg
        lr = cfg.get("lr", 2e-4)
        betas = (cfg.get("adam_b1", 0.8), cfg.get("adam_b2", 0.99))
        decay = cfg.get("lr_decay", 0.999)
        sched = optax.exponential_decay(lr, cfg.get("decay_steps", 1000), decay)
        self.g_tx = optax.adamw(sched, b1=betas[0], b2=betas[1])
        self.d_tx = optax.adamw(sched, b1=betas[0], b2=betas[1])
        self.mel_weight = cfg.get("mel_weight", 45.0)
        self.fm_weight = cfg.get("fm_weight", 2.0)
        self.dur_weight = cfg.get("dur_weight", 1.0)
        self.mel_kw = dict(
            n_fft=cfg.get("n_fft", 1024), hop=cfg.get("hop_size", 256),
            win=cfg.get("win_size", 1024), num_mels=cfg.get("num_mels", 80),
            sample_rate=cfg.get("sampling_rate", 16000),
        )
        self._d_step = jax.jit(self.d_step)
        self._g_step = jax.jit(self.g_step)

    # ------------------------------------------------------------- init ----
    def init_state(self, rng, example_code, example_wav) -> GanTrainState:
        r_g, r_mpd, r_msd = jax.random.split(rng, 3)

        def init_all(m, c):
            out = m(c)
            if getattr(m, "dur_predictor", False) and hasattr(
                m, "predict_durations"
            ):
                m.predict_durations(c)
            return out

        g_vars = self.gen.init(r_g, example_code, method=init_all)
        fake = self.gen.apply(g_vars, example_code)
        d_params = {
            "mpd": self.mpd.init(r_mpd, example_wav, fake)["params"],
            "msd": self.msd.init(r_msd, example_wav, fake)["params"],
        }
        return GanTrainState(
            step=jnp.zeros((), jnp.int32),
            g_params=g_vars["params"],
            d_params=d_params,
            g_opt=self.g_tx.init(g_vars["params"]),
            d_opt=self.d_tx.init(d_params),
        )

    def _generate(self, g_params, code):
        return self.gen.apply({"params": g_params}, code)

    # ------------------------------------------------------------ d step ---
    def d_step(self, state: GanTrainState, code, wav):
        fake = jax.lax.stop_gradient(self._generate(state.g_params, code))
        wav = wav[:, : fake.shape[1]]

        def loss_fn(d_params):
            mpd_outs = self.mpd.apply({"params": d_params["mpd"]}, wav, fake)
            msd_outs = self.msd.apply({"params": d_params["msd"]}, wav, fake)
            return discriminator_loss(mpd_outs) + discriminator_loss(msd_outs)

        loss, grads = jax.value_and_grad(loss_fn)(state.d_params)
        updates, new_opt = self.d_tx.update(grads, state.d_opt, state.d_params)
        new_params = optax.apply_updates(state.d_params, updates)
        return state.replace(d_params=new_params, d_opt=new_opt), loss

    # ------------------------------------------------------------ g step ---
    def g_step(self, state: GanTrainState, code, wav, durations=None,
               dur_code=None):
        def loss_fn(g_params):
            fake = self._generate(g_params, code)
            real = wav[:, : fake.shape[1]]
            mpd_outs = self.mpd.apply({"params": state.d_params["mpd"]}, real, fake)
            msd_outs = self.msd.apply({"params": state.d_params["msd"]}, real, fake)
            adv = generator_adv_loss(mpd_outs) + generator_adv_loss(msd_outs)
            fm = feature_matching_loss(mpd_outs) + feature_matching_loss(msd_outs)
            mel_r = mel_spectrogram(real, **self.mel_kw)
            mel_f = mel_spectrogram(fake, **self.mel_kw)
            mel = jnp.mean(jnp.abs(mel_r - mel_f))
            loss = adv + self.fm_weight * fm + self.mel_weight * mel
            aux = {"adv": adv, "fm": fm, "mel": mel}
            if durations is not None and self.gen.dur_predictor:
                from diffnorm_tpu.models.hifigan import CodeGenerator

                # duration labels are run lengths over the REDUCED unit
                # sequence (dur_code), -100 marking padded slots — the
                # predictor trains on its synthesis-time input
                # (reference hubert_to_speech.py:67-92)
                inp = dur_code if dur_code is not None else code
                log_dur = self.gen.apply(
                    {"params": g_params}, inp,
                    method=CodeGenerator.log_durations,
                )
                keep = durations != -100
                dur_tgt = jnp.log(
                    jnp.maximum(durations, 0).astype(jnp.float32) + 1.0)
                sq = jnp.square(log_dur - dur_tgt)
                dur_mse = (jnp.sum(jnp.where(keep, sq, 0.0))
                           / jnp.maximum(jnp.sum(keep), 1))
                loss = loss + self.dur_weight * dur_mse
                aux["dur_mse"] = dur_mse
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.g_params
        )
        updates, new_opt = self.g_tx.update(grads, state.g_opt, state.g_params)
        new_params = optax.apply_updates(state.g_params, updates)
        new_state = state.replace(
            step=state.step + 1, g_params=new_params, g_opt=new_opt
        )
        return new_state, loss, aux

    # ------------------------------------------------------------ public ---
    def train_step(self, state: GanTrainState, batch) -> Tuple[GanTrainState, Dict]:
        code = batch["features"] if "features" in batch else batch["code"]
        wav = batch["wav"]
        state, d_loss = self._d_step(state, code, wav)
        state, g_loss, aux = self._g_step(state, code, wav,
                                          batch.get("durations"),
                                          batch.get("dur_code"))
        # one device->host pull for all logged scalars (per-scalar float()
        # costs a full round trip each through the TPU tunnel)
        d_h, g_h, aux_h = jax.device_get((d_loss, g_loss, aux))
        mets = {"loss_d": float(d_h), "loss_g": float(g_h)}
        mets.update({k: float(v) for k, v in aux_h.items()})
        return state, mets
