"""Speech VAE: WaveNet down-stack -> diagonal Gaussian latent -> WaveNet
up-stack -> Transformer decoder head -> unit LM head.

Capability parity with the reference `speech_vae_decoder` arch
(fairseq/models/text_to_speech/speech_vae_decoder.py:60-65 and
latent_module.py:1035-1142):

* channel multipliers per latent size: 16 -> [4,3,2], 32 -> [4,3], 128 -> [3]
  so 768-d mHuBERT features compress to a 2*latent-channel Gaussian head
* encode = WaveNet blocks then split mean/logvar, sample z = mu + sigma*eps
* decode = WaveNet blocks back to 768 then a 6-layer transformer
  (dim_head 96, heads 8, causal-conv GEGLU FF) and a linear LM head over the
  unit vocabulary (1000 units + 4 specials = 1004)
* masked KL: 0.5 * mean over (T, C) of (mu^2 + var - 1 - logvar) on valid
  frames (reference distributions.py:62-88 kl_3d)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diffnorm_tpu.config import Config
from diffnorm_tpu.models.layers import ConditionableTransformer
from diffnorm_tpu.models.wavenet import Wavenet
from diffnorm_tpu.registry import register_architecture, register_model

CHAN_MULTS = {16: [4, 3, 2], 32: [4, 3], 128: [3]}


def gaussian_sample(params2c, rng, noise=None):
    """params2c: [..., 2C] (mean ++ logvar). Returns (z, mean, logvar).

    `noise` overrides the drawn eps (parity tests inject the reference's
    torch.randn stream to compare sampled paths exactly)."""
    mean, logvar = jnp.split(params2c, 2, axis=-1)
    logvar = jnp.clip(logvar, -30.0, 20.0)
    std = jnp.exp(0.5 * logvar)
    eps = (jnp.asarray(noise, mean.dtype) if noise is not None
           else jax.random.normal(rng, mean.shape, dtype=mean.dtype))
    return mean + std * eps, mean, logvar


def gaussian_kl_masked(mean, logvar, mask):
    """Masked diagonal-Gaussian KL to N(0, I), reference kl_3d parity:
    zero padded frames, then mean over (T, C) *including* the zeros, then the
    caller takes the batch mean. mask: [B, T] True = valid."""
    var = jnp.exp(logvar)
    kl = jnp.square(mean) + var - 1.0 - logvar
    kl = jnp.where(mask[..., None], kl, 0.0)
    return 0.5 * jnp.mean(kl, axis=(1, 2))


class SpeechVAEModule(nn.Module):
    dim: int = 768
    latent_dim: int = 128
    vocab_size: int = 1004
    decoder_depth: int = 6
    decoder_dim_head: int = 96
    decoder_heads: int = 8
    chan_mults: Optional[Tuple[int, ...]] = None  # default: CHAN_MULTS[latent]
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        mults = (
            list(self.chan_mults)
            if self.chan_mults is not None
            else CHAN_MULTS[self.latent_dim]
        )
        enc, cur = [], self.dim
        for i, m in enumerate(mults):
            cur = cur // m
            enc.append(
                Wavenet(dim=cur, stacks=2, layers=3, dtype=self.dtype,
                        name=f"enc_wave_{i}")
            )
        self.encoder_wave = enc

        dec, cur = [], cur  # cur == 2 * latent_dim here
        for i, m in enumerate(reversed(mults)):
            target = cur * m
            dec.append(
                Wavenet(dim=target, stacks=2, layers=3, dtype=self.dtype,
                        name=f"dec_wave_{i}")
            )
            cur = target
        self.decoder_wave = dec

        self.decoder_tf = ConditionableTransformer(
            dim=self.dim, depth=self.decoder_depth, dim_head=self.decoder_dim_head,
            heads=self.decoder_heads, ff_mult=4,
            ff_causal_conv=True, dtype=self.dtype, name="decoder_tf",
        )
        self.decoder_lm = nn.Dense(self.vocab_size, dtype=self.dtype, name="decoder_lm")

    def encode_params(self, feature):
        """feature [B, T, 768] -> Gaussian parameters [B, T, 2*latent]."""
        x = feature
        for block in self.encoder_wave:
            x = block(x)
        return x

    def encode(self, feature, rng, noise=None):
        """Sampled latent [B, T, latent]. Used frozen by the diffusion stage
        (reference encode_feature latent_module.py:1099-1107 is @no_grad)."""
        z, _, _ = gaussian_sample(self.encode_params(feature), rng, noise=noise)
        return z

    def decode(self, latent, mask, deterministic: bool = True):
        """latent [B, T, latent], mask [B, T] True=valid ->
        (decoded_feature [B, T, 768], lm_logits [B, T, vocab])."""
        x = latent
        for block in self.decoder_wave:
            x = block(x)
        feat = self.decoder_tf(x, mask=mask, deterministic=deterministic)
        return feat, self.decoder_lm(feat)

    def __call__(self, feature, mask, rng, deterministic: bool = True,
                 noise=None):
        """Training forward. Returns (decoded_feature, lm_logits, kl_per_seq).
        `noise` overrides the posterior eps draw (trajectory-parity tests
        inject the reference's stream)."""
        params2c = self.encode_params(feature)
        z, mean, logvar = gaussian_sample(params2c, rng, noise=noise)
        kl = gaussian_kl_masked(mean, logvar, mask)
        feat, logits = self.decode(z, mask, deterministic=deterministic)
        return feat, logits, kl


@dataclasses.dataclass
class ModelHolder:
    """A built model: flax module + the config it was built with."""

    module: nn.Module
    cfg: Config

    def init(self, rng, *args, **kwargs):
        return self.module.init(rng, *args, **kwargs)

    def apply(self, variables, *args, **kwargs):
        return self.module.apply(variables, *args, **kwargs)


@register_model("speech_vae")
class SpeechVAEModel(ModelHolder):
    @classmethod
    def build_model(cls, cfg: Config, task=None) -> "SpeechVAEModel":
        vocab = cfg.get("vocab_size")
        if vocab is None and task is not None and task.target_dictionary is not None:
            vocab = len(task.target_dictionary)
        module = SpeechVAEModule(
            dim=cfg.get("feature_dim", 768),
            latent_dim=cfg.get("latent_dim", 128),
            vocab_size=vocab or 1004,
            decoder_depth=cfg.get("vae_decoder_depth", 6),
            decoder_dim_head=cfg.get("vae_decoder_dim_head", 96),
            decoder_heads=cfg.get("vae_decoder_heads", 8),
            chan_mults=cfg.get("chan_mults"),
            dtype=jnp.dtype(cfg.get("dtype", "float32")),
        )
        return cls(module=module, cfg=cfg)


@register_architecture("speech_vae", "speech_vae_decoder")
def speech_vae_decoder_arch(cfg: Config):
    """Defaults parity with speech_vae_decoder.py:68-136 + conformer stamps."""
    cfg.setdefault("feature_dim", 768)
    cfg.setdefault("latent_dim", 128)
