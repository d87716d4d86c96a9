"""TranSpeech-style speech/speaker normalization utilities, TPU-native.

Capability parity with the reference's `research/TranSpeech/hubertCTC/`
package (the *baseline* normalization that DiffNorm's diffusion normalizer
supersedes):

* `gen_SN.py` — speaker normalization: per-split pitch-median estimation
  (praat "To Pitch" + median quantile there), pitch-shift of every
  utterance to the split-mean median (praat "Change gender" there), then
  energy normalization to the split mean |x|.
* `functions/yin.py` — FFT-based YIN difference function / CMNDF
  (the repo's own pitch front end for its NAR-TTS utilities).
* `Resample.py:InterpLnr` — random segment-wise linear time-resampling
  ("rhythm perturbation") used by the information-enhancement driver
  (`gen_IE.py`).

TPU mapping: the YIN pitch tracker is one jit-able JAX program (framing ->
rFFT autocorrelation -> CMNDF -> thresholded lag pick with parabolic
interpolation), so pitch extraction for a whole split batches onto the
chip. The waveform-domain shift/stretch runs host-side in numpy (ragged
output lengths don't jit); a praat-exact formant-preserving path is gated
on `parselmouth` being importable, which this image does not ship.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

# ------------------------------------------------------------------ YIN ---


def _frame(x: jnp.ndarray, frame_length: int, hop: int) -> jnp.ndarray:
    """[T] -> [N, frame_length] strided frames (truncating the tail)."""
    n = 1 + max(0, (x.shape[-1] - frame_length)) // hop
    starts = jnp.arange(n) * hop
    idx = starts[:, None] + jnp.arange(frame_length)[None, :]
    return x[idx]


def yin_difference(frames: jnp.ndarray, tau_max: int) -> jnp.ndarray:
    """YIN difference function d(tau) over the trailing axis.

    d(tau) = sum_j (x_j - x_{j+tau})^2 computed with the cumulative-energy
    + FFT-autocorrelation identity (reference functions/yin.py:7-31).
    frames: [..., W] -> [..., tau_max].
    """
    w = frames.shape[-1]
    tau_max = min(tau_max, w)
    sq = (frames * frames).astype(jnp.float32)
    zero = jnp.zeros(frames.shape[:-1] + (1,), jnp.float32)
    cum = jnp.concatenate([zero, jnp.cumsum(sq, -1)], -1)  # [..., W+1]
    size = w + tau_max
    nfft = 1 << (size - 1).bit_length()
    fc = jnp.fft.rfft(frames.astype(jnp.float32), nfft)
    ac = jnp.fft.irfft(fc * jnp.conj(fc), nfft)[..., :tau_max]
    head = jnp.take(cum, w - jnp.arange(tau_max), axis=-1)
    return head + cum[..., w:w + 1] - cum[..., :tau_max] - 2.0 * ac


def yin_cmndf(d: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Cumulative-mean-normalized difference (reference yin.py:34-48):
    cmndf(0)=1, cmndf(tau) = d(tau) * tau / sum_{1..tau} d."""
    tau = jnp.arange(1, d.shape[-1], dtype=jnp.float32)
    cs = jnp.cumsum(d[..., 1:], -1)
    body = d[..., 1:] * tau / (cs + eps)
    one = jnp.ones(d.shape[:-1] + (1,), d.dtype)
    return jnp.concatenate([one, body], -1)


def yin_pitch(
    wav: jnp.ndarray,
    sr: int,
    frame_length: int = 2048,
    hop: int = 256,
    fmin: float = 75.0,
    fmax: float = 600.0,
    threshold: float = 0.15,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-frame YIN f0 for one waveform.

    Returns (f0 [N], voiced [N] bool). Lag pick: the first tau in
    [sr/fmax, sr/fmin) whose CMNDF dips under `threshold` (argmin if none
    dips), refined by parabolic interpolation; a frame is voiced iff a
    sub-threshold dip exists. Fully jit-able (shapes static given T).
    """
    tau_min = max(2, int(sr / fmax))
    tau_max = min(int(sr / fmin) + 1, frame_length)
    frames = _frame(jnp.asarray(wav, jnp.float32), frame_length, hop)
    cmndf = yin_cmndf(yin_difference(frames, tau_max))  # [N, tau_max]

    lags = jnp.arange(tau_max)
    in_range = (lags >= tau_min) & (lags < tau_max)
    masked = jnp.where(in_range, cmndf, jnp.inf)
    below = masked < threshold
    # silent frames have an identically-zero CMNDF; gate on frame energy
    rms = jnp.sqrt(jnp.mean(frames * frames, axis=-1))
    voiced = jnp.any(below, axis=-1) & (rms > 1e-5)
    first_dip = jnp.argmax(below, axis=-1)
    fallback = jnp.argmin(masked, axis=-1)
    # YIN picks the local minimum FOLLOWING the first threshold crossing
    # (the CMNDF keeps descending past the crossing toward the true lag)
    nxt = jnp.concatenate(
        [cmndf[..., 1:], jnp.full_like(cmndf[..., :1], jnp.inf)], -1
    )
    follow = (nxt >= cmndf) & in_range & (lags >= first_dip[..., None])
    tau_voiced = jnp.where(jnp.any(follow, -1), jnp.argmax(follow, -1),
                           fallback)
    tau = jnp.where(voiced, tau_voiced, fallback)  # [N]

    # parabolic interpolation of the dip on the raw CMNDF
    def gather(off):
        return jnp.take_along_axis(
            cmndf, jnp.clip(tau + off, 0, tau_max - 1)[:, None], axis=-1
        )[:, 0]

    y0, y1, y2 = gather(-1), gather(0), gather(1)
    denom = y0 - 2.0 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-12,
                      0.5 * (y0 - y2) / jnp.where(denom == 0, 1.0, denom),
                      0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    f0 = sr / (tau.astype(jnp.float32) + delta)
    return jnp.where(voiced, f0, 0.0), voiced


def pitch_median(wav: np.ndarray, sr: int, **kw) -> float:
    """Median voiced f0 (reference functional.py:359-367 uses praat's
    median pitch quantile; this is the YIN equivalent). 0.0 if unvoiced."""
    f0, voiced = yin_pitch(jnp.asarray(wav, jnp.float32), sr, **kw)
    f0 = np.asarray(f0)[np.asarray(voiced)]
    return float(np.median(f0)) if f0.size else 0.0


# --------------------------------------------- phase-vocoder pitch shift --


def _stft(x: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    win = np.hanning(n_fft).astype(np.float32)
    pad = n_fft // 2
    x = np.pad(x, (pad, pad))
    n = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n)[:, None] * hop + np.arange(n_fft)[None, :]
    return np.fft.rfft(x[idx] * win, axis=-1)  # [N, F]


def _istft(S: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    win = np.hanning(n_fft).astype(np.float32)
    frames = np.fft.irfft(S, n_fft, axis=-1).real * win
    out_len = hop * (S.shape[0] - 1) + n_fft
    out = np.zeros(out_len, np.float32)
    norm = np.zeros(out_len, np.float32)
    wsq = win * win
    for i in range(S.shape[0]):
        out[i * hop:i * hop + n_fft] += frames[i]
        norm[i * hop:i * hop + n_fft] += wsq
    out = out / np.maximum(norm, 1e-8)
    pad = n_fft // 2
    return out[pad:-pad] if pad else out


def _phase_vocoder(S: np.ndarray, rate: float, hop: int) -> np.ndarray:
    """Stretch an STFT [N, F] to ~N/rate frames at constant pitch."""
    n, f = S.shape
    steps = np.arange(0, n - 1, rate)
    omega = 2.0 * math.pi * hop * np.arange(f) / ((f - 1) * 2)
    out = np.zeros((len(steps), f), np.complex128)
    phase = np.angle(S[0])
    for i, t in enumerate(steps):
        k = int(t)
        frac = t - k
        mag = (1.0 - frac) * np.abs(S[k]) + frac * np.abs(S[k + 1])
        out[i] = mag * np.exp(1j * phase)
        dphi = np.angle(S[k + 1]) - np.angle(S[k]) - omega
        dphi -= 2.0 * math.pi * np.round(dphi / (2.0 * math.pi))
        phase = phase + omega + dphi
    return out


def _linear_resample(x: np.ndarray, out_len: int) -> np.ndarray:
    pos = np.linspace(0.0, len(x) - 1.0, out_len)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, len(x) - 1)
    lam = (pos - lo).astype(np.float32)
    return (1.0 - lam) * x[lo] + lam * x[hi]


def pitch_shift(wav: np.ndarray, sr: int, ratio: float,
                n_fft: int = 1024, hop: int = 256) -> np.ndarray:
    """Shift all frequencies by `ratio` at constant duration.

    Resample to T/ratio (raises pitch by `ratio` when played at sr), then
    phase-vocoder time-stretch back to the original length. The reference
    (functional.py:369-382) does this with praat "Change gender", which
    additionally preserves formants; a praat path is used when
    `parselmouth` is importable.
    """
    wav = np.asarray(wav, np.float32)
    if abs(ratio - 1.0) < 1e-4 or len(wav) < n_fft * 2:
        return wav
    try:  # exact-parity path when the praat binding exists
        import parselmouth

        sound = parselmouth.Sound(wav.astype(np.float64),
                                  sampling_frequency=sr)
        pitch = parselmouth.praat.call(sound, "To Pitch", 0.8 / 75, 75, 600)
        median = parselmouth.praat.call(pitch, "Get quantile", 0.0, 0.0,
                                        0.5, "Hertz")
        new = parselmouth.praat.call((sound, pitch), "Change gender", 1.0,
                                     median * ratio, 1.0, 1.0)
        return np.asarray(new.values, np.float32).squeeze(0)
    except ImportError:
        pass
    squeezed = _linear_resample(wav, max(int(round(len(wav) / ratio)),
                                         n_fft * 2))
    S = _stft(squeezed, n_fft, hop)
    stretched = _phase_vocoder(S, rate=len(squeezed) / len(wav), hop=hop)
    out = _istft(stretched, n_fft, hop)
    return _linear_resample(out, len(wav))


def shift_to_median(wav: np.ndarray, sr: int,
                    new_median: float) -> np.ndarray:
    """Reference `manipulate_median` (functional.py:369-382): measure the
    utterance's median f0, shift so the median lands on `new_median`."""
    med = pitch_median(wav, sr)
    if med <= 0 or new_median <= 0:
        return np.asarray(wav, np.float32)
    return pitch_shift(wav, sr, new_median / med)


# ------------------------------------------------------------ energy norm --


def mean_abs_energy(wav: np.ndarray) -> float:
    """gen_SN.py's per-utterance energy statistic: mean |x|."""
    return float(np.mean(np.abs(np.asarray(wav, np.float32))))


def normalize_energy(wav: np.ndarray, target: float) -> np.ndarray:
    """Scale so mean |x| == target (gen_SN.py:46-51)."""
    wav = np.asarray(wav, np.float32)
    e = np.mean(np.abs(wav))
    return wav if e < 1e-8 else wav / e * target


# --------------------------------------------------- rhythm perturbation --


def random_segment_resample(
    x: np.ndarray,
    len_seq: Optional[int],
    rng: np.random.Generator,
    min_len_seg: int = 19,
    max_len_seg: int = 32,
) -> np.ndarray:
    """InterpLnr rhythm perturbation (reference Resample.py:352-432).

    Splits the first `len_seq` frames of x [T, C] into segments of random
    length in [min_len_seg, max_len_seg) and linearly re-samples each by a
    random scale in [0.5, 1.5); segments are laid out with cumulative
    offsets exactly as the reference's vectorized gather does, truncating
    at the last valid interpolation pair (index < len_seq - 1).
    """
    x = np.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    len_seq = x.shape[0] if len_seq is None else int(len_seq)
    out = []
    offset = 0
    while offset < len_seq - 1:
        seg_len = int(rng.integers(min_len_seg, max_len_seg))
        scale = float(rng.random()) + 0.5
        idx = np.arange(2 * max_len_seg, dtype=np.float64) / scale
        fl = np.floor(idx).astype(int)
        keep = (fl < seg_len - 1) & (fl + offset < len_seq - 1)
        if keep.any():
            f = fl[keep] + offset
            lam = (idx - np.floor(idx))[keep][:, None].astype(x.dtype)
            out.append((1.0 - lam) * x[f] + lam * x[f + 1])
        offset += seg_len
    if not out:
        return x[:1]
    return np.concatenate(out, 0)
