"""On-device log-mel spectrogram (jnp) for the HiFi-GAN mel loss.

The vocoder fine-tune tasks (reference: research/TranSpeech/hifigan/ +
fairseq unit_to_speech task) need a differentiable mel transform on the
generator output; this mirrors data/audio.py's host fbank but runs inside
jit (framing as strided gather -> rfft -> mel matmul on the MXU).
HiFi-GAN convention: hann window, reflect padding, log(clamp(mel, 1e-5)).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _mel_matrix(num_mels: int, n_fft: int, sample_rate: int,
                fmin: float, fmax: float) -> np.ndarray:
    """Slaney-style mel filterbank [n_fft//2+1, num_mels] (librosa default
    used by HiFi-GAN's meldataset)."""
    def hz_to_mel(f):
        # Slaney scale: linear below 1 kHz, log above
        f = np.asarray(f, dtype=np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(
            log_region,
            15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0),
            mel,
        )
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, dtype=np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        return np.where(log_region, 1000.0 * np.exp((m - 15.0) * np.log(6.4) / 27.0), f)

    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, n_bins)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), num_mels + 2))
    weights = np.zeros((n_bins, num_mels), dtype=np.float32)
    for i in range(num_mels):
        lower, center, upper = mel_pts[i], mel_pts[i + 1], mel_pts[i + 2]
        up = (fft_freqs - lower) / max(center - lower, 1e-10)
        down = (upper - fft_freqs) / max(upper - center, 1e-10)
        w = np.maximum(0.0, np.minimum(up, down))
        # Slaney normalization
        weights[:, i] = w * (2.0 / (upper - lower))
    return weights


def mel_spectrogram(
    wav,
    n_fft: int = 1024,
    hop: int = 256,
    win: int = 1024,
    num_mels: int = 80,
    sample_rate: int = 16000,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
):
    """wav: [B, T] -> log-mel [B, frames, num_mels], differentiable."""
    fmax = fmax or sample_rate / 2
    assert wav.shape[1] + (n_fft - hop) >= win, (
        f"waveform too short for mel window: {wav.shape[1]} samples, "
        f"win={win} hop={hop}"
    )
    pad = (n_fft - hop) // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[1] - win) // hop
    idx = jnp.arange(win)[None, :] + hop * jnp.arange(n_frames)[:, None]
    frames = x[:, idx]  # [B, frames, win]
    window = jnp.asarray(np.hanning(win + 1)[:-1], jnp.float32)
    spec = jnp.abs(jnp.fft.rfft(frames * window, n=n_fft, axis=-1))
    mel_w = jnp.asarray(_mel_matrix(num_mels, n_fft, sample_rate, fmin, fmax))
    mel = jnp.einsum("btf,fm->btm", spec, mel_w)
    return jnp.log(jnp.clip(mel, 1e-5))
