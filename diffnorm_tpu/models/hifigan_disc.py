"""HiFi-GAN discriminators + GAN losses for vocoder fine-tuning.

Capability parity with the vendored TranSpeech HiFi-GAN training code
(research/TranSpeech/hifigan/models.py:128-283 — MultiPeriodDiscriminator
with periods 2/3/5/7/11 of strided 2-D convs over period-folded waveforms,
MultiScaleDiscriminator over avg-pooled scales — plus the LSGAN
generator/discriminator losses and feature matching).

Everything is batch-first jnp; the discriminators jit together with the
generator inside the GAN trainer's d/g steps.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LRELU_SLOPE = 0.1


def leaky_relu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


class PeriodDiscriminator(nn.Module):
    period: int
    # width=1 is the reference topology (channels 32/128/512/1024); smaller
    # widths keep the layer structure for cheap smoke/dryrun compiles
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """wav: [B, T] -> (score [B, n], feature maps)."""
        b, t = wav.shape
        p = self.period
        pad = (p - t % p) % p
        x = jnp.pad(wav, ((0, 0), (0, pad)), mode="reflect" if pad and t > 1 else "constant")
        x = x.reshape(b, -1, p, 1)  # [B, T/p, p, 1]
        fmaps = []
        chans = [max(4, int(c * self.width)) for c in (32, 128, 512, 1024)]
        for i, ch in enumerate(chans):
            x = nn.Conv(
                ch, kernel_size=(5, 1), strides=(3, 1),
                padding=[(2, 2), (0, 0)], dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmaps.append(x)
        x = nn.Conv(chans[-1], kernel_size=(5, 1), padding=[(2, 2), (0, 0)],
                    dtype=self.dtype, name="conv_4")(x)
        x = leaky_relu(x)
        fmaps.append(x)
        x = nn.Conv(1, kernel_size=(3, 1), padding=[(1, 1), (0, 0)],
                    dtype=self.dtype, name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(b, -1), fmaps


class ScaleDiscriminator(nn.Module):
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, wav):
        """wav: [B, T] -> (score, feature maps); 1-D grouped conv stack."""
        x = wav[:, :, None]
        fmaps = []
        specs = [
            (128, 15, 1, 1), (128, 41, 2, 4), (256, 41, 2, 16),
            (512, 41, 4, 16), (1024, 41, 4, 16), (1024, 41, 1, 16),
            (1024, 5, 1, 1),
        ]
        if self.width != 1.0:
            from math import gcd

            scaled = []
            for i, (c, k, s, g) in enumerate(specs):
                # output channels must stay divisible by this layer's OWN
                # feature_group_count AND the NEXT layer's (its input is
                # this layer's output) — round up to their lcm
                ng = specs[i + 1][3] if i + 1 < len(specs) else 1
                mult = g * ng // gcd(g, ng)
                ch = max(int(c * self.width), mult)
                ch = ((ch + mult - 1) // mult) * mult
                scaled.append((ch, k, s, g))
            specs = scaled
        for i, (ch, k, s, g) in enumerate(specs):
            x = nn.Conv(
                ch, kernel_size=(k,), strides=(s,), padding=[(k // 2, k // 2)],
                feature_group_count=g, dtype=self.dtype, name=f"conv_{i}",
            )(x)
            x = leaky_relu(x)
            fmaps.append(x)
        x = nn.Conv(1, kernel_size=(3,), padding=[(1, 1)], dtype=self.dtype,
                    name="conv_post")(x)
        fmaps.append(x)
        return x.reshape(wav.shape[0], -1), fmaps


def avg_pool1d(x, k: int = 4, stride: int = 2):
    pad = k // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)))
    n = (x.shape[1] - k) // stride + 1
    idx = jnp.arange(k)[None, :] + stride * jnp.arange(n)[:, None]
    return jnp.mean(x[:, idx], axis=-1)


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, real, fake):
        outs = []
        for p in self.periods:
            d = PeriodDiscriminator(p, width=self.width, dtype=self.dtype,
                                    name=f"period_{p}")
            outs.append((d(real), d(fake)))
        return outs


class MultiScaleDiscriminator(nn.Module):
    scales: int = 3
    width: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, real, fake):
        outs = []
        r, f = real, fake
        for s in range(self.scales):
            d = ScaleDiscriminator(width=self.width, dtype=self.dtype,
                                   name=f"scale_{s}")
            outs.append((d(r), d(f)))
            if s < self.scales - 1:
                r, f = avg_pool1d(r), avg_pool1d(f)
        return outs


# ------------------------------------------------------------- losses -----

def discriminator_loss(outs) -> jnp.ndarray:
    """LSGAN: (1-D(real))^2 + D(fake)^2 summed over discriminators."""
    loss = 0.0
    for (real_score, _), (fake_score, _) in outs:
        real_score = real_score.astype(jnp.float32)
        fake_score = fake_score.astype(jnp.float32)
        loss = loss + jnp.mean((1.0 - real_score) ** 2)
        loss = loss + jnp.mean(fake_score ** 2)
    return loss


def generator_adv_loss(outs) -> jnp.ndarray:
    """LSGAN generator side: (1 - D(fake))^2."""
    loss = 0.0
    for _, (fake_score, _) in outs:
        loss = loss + jnp.mean((1.0 - fake_score.astype(jnp.float32)) ** 2)
    return loss


def feature_matching_loss(outs) -> jnp.ndarray:
    """L1 between real/fake discriminator feature maps."""
    loss = 0.0
    for (_, real_maps), (_, fake_maps) in outs:
        for r, f in zip(real_maps, fake_maps):
            loss = loss + jnp.mean(jnp.abs(
                r.astype(jnp.float32) - f.astype(jnp.float32)))
    return loss
