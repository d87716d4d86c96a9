"""Mel-cepstral distortion (MCD) between synthesized and reference audio.

Capability parity with fairseq's batch_mel_cepstral_distortion
(fairseq/tasks/text_to_speech.py / speech_generator eval): mel cepstra via
log-mel -> DCT, DTW alignment over frames, MCD = (10*sqrt(2)/ln10) * mean
aligned euclidean distance over cepstral dims 1..K.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

from diffnorm_tpu.data.audio import logmel_fbank


def mel_cepstra(wav: np.ndarray, sample_rate: int = 16000,
                num_mels: int = 80, num_ceps: int = 13) -> np.ndarray:
    """[T] waveform -> [frames, num_ceps] cepstra (c0 excluded)."""
    logmel = logmel_fbank(wav, sample_rate=sample_rate, num_bins=num_mels)
    n = logmel.shape[1]
    # DCT-II basis
    k = np.arange(num_ceps + 1)[:, None]
    m = np.arange(n)[None, :]
    basis = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * math.sqrt(2.0 / n)
    ceps = logmel @ basis.T  # [frames, num_ceps+1]
    return ceps[:, 1:]  # drop c0 (energy)


def dtw_distance(x: np.ndarray, y: np.ndarray) -> Tuple[float, int]:
    """DTW with euclidean local cost; returns (total cost, path length)."""
    tx, ty = len(x), len(y)
    dist = np.sqrt(
        ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    )  # [tx, ty]
    acc = np.full((tx + 1, ty + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, tx + 1):
        prev = np.minimum(acc[i - 1, 1:], acc[i - 1, :-1])  # diag/up neighbors
        row = np.empty(ty)
        left = np.inf
        for j in range(ty):  # left-neighbor dependency forces the scan
            row[j] = dist[i - 1, j] + min(prev[j], left)
            left = row[j]
        acc[i, 1:] = row
    # recover path length by backtracking
    i, j = tx, ty
    steps = 0
    while i > 1 or j > 1:
        steps += 1
        choices = [
            (acc[i - 1, j - 1], i - 1, j - 1),
            (acc[i - 1, j], i - 1, j),
            (acc[i, j - 1], i, j - 1),
        ]
        _, i, j = min(choices, key=lambda c: c[0])
    return float(acc[tx, ty]), steps + 1


MCD_CONST = 10.0 * math.sqrt(2.0) / math.log(10.0)


def mel_cepstral_distortion(wav_pred: np.ndarray, wav_ref: np.ndarray,
                            sample_rate: int = 16000) -> float:
    """MCD (dB) between two waveforms with DTW frame alignment."""
    cp = mel_cepstra(wav_pred, sample_rate)
    cr = mel_cepstra(wav_ref, sample_rate)
    if len(cp) == 0 or len(cr) == 0:
        return float("inf")
    cost, path_len = dtw_distance(cp, cr)
    return MCD_CONST * cost / max(path_len, 1)


def batch_mel_cepstral_distortion(preds, refs, sample_rate: int = 16000):
    """Mean MCD over pairs (reference batch_mel_cepstral_distortion)."""
    vals = [
        mel_cepstral_distortion(p, r, sample_rate) for p, r in zip(preds, refs)
    ]
    return float(np.mean(vals)), vals
