"""FastSpeech2-style non-autoregressive TTS (text/units -> log-mel).

Capability parity with fairseq/models/text_to_speech/fastspeech2.py (the
reference's TTS family member whose VariancePredictor the code-HiFi-GAN
duration predictor reuses) + the non-AR path of fairseq/speech_generator.py:

* transformer encoder over tokens
* variance adaptor: duration / pitch / energy predictors; pitch & energy
  quantized to 256-bin embeddings added to the encoder states
* length regulation by duration (host-side repeat for ragged expansion,
  jnp gather under jit for fixed frames)
* transformer decoder -> 80-bin log-mel + residual postnet

Generation pairs with HifiGanGenerator(model_in_dim=80) for waveforms and
eval/mcd.py for MCD scoring.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.cmlm_text import TextEncoder, TextEncoderLayer
from diffnorm_tpu.models.hifigan import VariancePredictor
from diffnorm_tpu.models.layers import sinusoidal_positions
from diffnorm_tpu.models.vae import ModelHolder
from diffnorm_tpu.registry import register_architecture, register_model

PAD = 1
N_BINS = 256


def length_regulate(x, durations, max_frames: int):
    """Expand encoder states by integer durations under jit.

    x: [B, T, D]; durations: [B, T] int -> ([B, max_frames, D], frame_mask).
    Gather formulation: frame f takes x[t] where cum[t-1] <= f < cum[t].
    """
    cum = jnp.cumsum(durations, axis=1)  # [B, T]
    frames = jnp.arange(max_frames)[None, :, None]  # [1, F, 1]
    # index of the source token for each frame
    src_idx = jnp.sum(frames >= cum[:, None, :], axis=-1)  # [B, F]
    src_idx = jnp.minimum(src_idx, x.shape[1] - 1)
    out = jnp.take_along_axis(x, src_idx[..., None], axis=1)
    frame_mask = jnp.arange(max_frames)[None, :] < cum[:, -1:]
    return out, frame_mask


class FastSpeech2Module(nn.Module):
    vocab_size: int
    dim: int = 256
    ffn_dim: int = 1024
    encoder_layers: int = 4
    decoder_layers: int = 4
    heads: int = 2
    n_mels: int = 80
    max_frames: int = 2048
    var_hidden: int = 256
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TextEncoder(
            vocab_size=self.vocab_size, dim=self.dim, ffn_dim=self.ffn_dim,
            layers=self.encoder_layers, heads=self.heads, dropout=self.dropout,
            dtype=self.dtype, name="encoder",
        )
        self.dur_predictor = VariancePredictor(
            hidden_dim=self.var_hidden, dtype=self.dtype, name="dur_predictor"
        )
        self.pitch_predictor = VariancePredictor(
            hidden_dim=self.var_hidden, dtype=self.dtype, name="pitch_predictor"
        )
        self.energy_predictor = VariancePredictor(
            hidden_dim=self.var_hidden, dtype=self.dtype,
            name="energy_predictor",
        )
        self.pitch_emb = nn.Embed(N_BINS, self.dim, name="pitch_emb")
        self.energy_emb = nn.Embed(N_BINS, self.dim, name="energy_emb")
        self.dec_layers = [
            TextEncoderLayer(self.dim, self.ffn_dim, self.heads, self.dropout,
                             self.dtype, name=f"dec_layer_{i}")
            for i in range(self.decoder_layers)
        ]
        self.mel_head = nn.Dense(self.n_mels, dtype=self.dtype, name="mel_head")
        self.postnet = [
            nn.Conv(self.n_mels if i == 4 else 256, kernel_size=(5,),
                    padding=[(2, 2)], dtype=self.dtype, name=f"postnet_{i}")
            for i in range(5)
        ]

    def _quantize(self, value, lo: float = -4.0, hi: float = 4.0):
        bins = jnp.clip(((value - lo) / (hi - lo) * N_BINS).astype(jnp.int32),
                        0, N_BINS - 1)
        return bins

    def __call__(
        self,
        tokens,
        durations=None,      # [B, T] gold (training) else predicted
        pitches=None,        # [B, T] gold per-token pitch (normalized)
        energies=None,
        deterministic: bool = True,
    ) -> Dict:
        enc, valid = self.encoder(tokens, deterministic=deterministic)

        log_dur_pred = self.dur_predictor(enc)
        pitch_pred = self.pitch_predictor(enc)
        energy_pred = self.energy_predictor(enc)

        pitch_in = pitches if pitches is not None else pitch_pred
        energy_in = energies if energies is not None else energy_pred
        enc = enc + self.pitch_emb(self._quantize(pitch_in)).astype(enc.dtype)
        enc = enc + self.energy_emb(self._quantize(energy_in)).astype(enc.dtype)

        if durations is None:
            durations = jnp.maximum(
                jnp.round(jnp.exp(log_dur_pred) - 1.0).astype(jnp.int32), 0
            )
        durations = jnp.where(valid, durations, 0)
        x, frame_mask = length_regulate(enc, durations, self.max_frames)

        x = x + sinusoidal_positions(frame_mask, self.dim).astype(x.dtype)
        for layer in self.dec_layers:
            x = layer(x, frame_mask, deterministic=deterministic)
        mel = self.mel_head(x)

        h = mel
        for i, conv in enumerate(self.postnet):
            h = conv(h)
            if i < 4:
                h = jnp.tanh(h)
        mel_post = mel + h
        return dict(
            mel=mel, mel_post=mel_post, frame_mask=frame_mask,
            log_dur=log_dur_pred, pitch=pitch_pred, energy=energy_pred,
        )


@register_model("fastspeech2")
class FastSpeech2Model(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "FastSpeech2Model":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = FastSpeech2Module(
            vocab_size=vocab or 1004,
            dim=cfg.get("encoder_embed_dim", 256),
            ffn_dim=cfg.get("encoder_ffn_embed_dim", 1024),
            encoder_layers=cfg.get("encoder_layers", 4),
            decoder_layers=cfg.get("decoder_layers", 4),
            heads=cfg.get("encoder_attention_heads", 2),
            n_mels=cfg.get("output_frame_dim", 80),
            max_frames=cfg.get("max_target_positions", 2048),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("fastspeech2", "fastspeech2_base")
def fastspeech2_arch(cfg: Config):
    cfg.setdefault("encoder_embed_dim", 256)
    cfg.setdefault("encoder_layers", 4)
    cfg.setdefault("decoder_layers", 4)


class NonARSpeechGenerator:
    """Non-autoregressive TTS generation wrapper (reference
    fairseq/speech_generator.py NonAutoregressiveSpeechGenerator): runs the
    FastSpeech2 forward with predicted variances and optionally vocodes the
    mel with a HiFi-GAN generator (model_in_dim=n_mels)."""

    def __init__(self, model, variables, vocoder=None):
        self.model = model
        self.variables = variables
        self.vocoder = vocoder
        self._fn = jax.jit(
            lambda v, toks: model.module.apply(v, toks, deterministic=True)
        )

    def generate(self, tokens) -> Dict:
        out = self._fn(self.variables, jnp.asarray(tokens))
        result = {
            "feature": np.asarray(out["mel_post"]),
            "frame_mask": np.asarray(out["frame_mask"]),
        }
        if self.vocoder is not None:
            wavs = []
            for i in range(result["feature"].shape[0]):
                mel = result["feature"][i][result["frame_mask"][i]]
                wavs.append(self.vocoder(mel))
            result["waveform"] = wavs
        return result
