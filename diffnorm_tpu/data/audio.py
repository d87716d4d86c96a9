"""Audio feature extraction + feature transforms.

Replaces fairseq/data/audio/audio_utils.py (get_features_or_waveform) and
fairseq/data/audio/feature_transforms/{utterance_cmvn,specaugment,...}.

The filterbank is a kaldi-style log-mel: 25 ms povey-windowed frames at
10 ms shift, 80 mel bins, snip_edges. Implemented in numpy on the host
(the data loader); heavy model-side preprocessing (HuBERT, k-means) is a
separate fused XLA graph in models/hubert.py.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np


# ---------------------------------------------------------------- fbank ----

def _mel(freq):
    return 1127.0 * np.log(1.0 + freq / 700.0)


def mel_filterbank(
    num_bins: int, fft_size: int, sample_rate: int,
    low_freq: float = 20.0, high_freq: Optional[float] = None,
) -> np.ndarray:
    """[num_bins, fft_size // 2 + 1] triangular mel filters (kaldi-style)."""
    high_freq = high_freq or sample_rate / 2
    n_fft_bins = fft_size // 2 + 1
    fft_freqs = np.arange(n_fft_bins) * sample_rate / fft_size
    mel_low, mel_high = _mel(low_freq), _mel(high_freq)
    mel_points = np.linspace(mel_low, mel_high, num_bins + 2)
    mel_fft = _mel(fft_freqs)
    fb = np.zeros((num_bins, n_fft_bins), dtype=np.float32)
    for i in range(num_bins):
        left, center, right = mel_points[i], mel_points[i + 1], mel_points[i + 2]
        up = (mel_fft - left) / (center - left)
        down = (right - mel_fft) / (right - center)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


def povey_window(n: int) -> np.ndarray:
    return (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n) / (n - 1))) ** 0.85


_FBANK_CACHE: Dict = {}


def logmel_fbank(
    waveform: np.ndarray,
    sample_rate: int = 16000,
    num_bins: int = 80,
    frame_length_ms: float = 25.0,
    frame_shift_ms: float = 10.0,
    dither: float = 0.0,
    preemphasis: float = 0.97,
) -> np.ndarray:
    """waveform: [T] float (any scale) -> [frames, num_bins] float32 log-mel."""
    wav = np.asarray(waveform, dtype=np.float32)
    if wav.ndim > 1:
        wav = wav.mean(axis=0) if wav.shape[0] < wav.shape[-1] else wav.mean(axis=-1)
    win = int(sample_rate * frame_length_ms / 1000)
    shift = int(sample_rate * frame_shift_ms / 1000)
    fft_size = 1 << (win - 1).bit_length()
    n_frames = max(0, (len(wav) - win) // shift + 1)
    if n_frames == 0:
        return np.zeros((0, num_bins), dtype=np.float32)

    key = (num_bins, fft_size, sample_rate, win)
    if key not in _FBANK_CACHE:
        _FBANK_CACHE[key] = (
            mel_filterbank(num_bins, fft_size, sample_rate),
            povey_window(win).astype(np.float32),
        )
    fb, window = _FBANK_CACHE[key]

    idx = np.arange(win)[None, :] + shift * np.arange(n_frames)[:, None]
    frames = wav[idx]
    # per-frame DC removal + preemphasis (kaldi order)
    frames = frames - frames.mean(axis=1, keepdims=True)
    pre = np.concatenate([frames[:, :1], frames[:, :-1]], axis=1)
    frames = frames - preemphasis * pre
    frames = frames * window[None, :]
    spec = np.abs(np.fft.rfft(frames, n=fft_size, axis=1)) ** 2
    mel = spec @ fb.T
    return np.log(np.maximum(mel, 1e-10)).astype(np.float32)


def get_features_or_waveform(path: str, need_waveform: bool = False):
    """Load per-utterance features: .npy passthrough; audio files run through
    the fbank (reference audio_utils.get_features_or_waveform)."""
    if path.endswith(".npy"):
        return np.load(path)
    wav, sr = read_audio(path)
    if need_waveform:
        return wav
    return logmel_fbank(wav, sample_rate=sr)


def read_audio(path: str):
    """Minimal WAV reader (16-bit PCM / float); soundfile if available."""
    try:
        import soundfile as sf

        wav, sr = sf.read(path, dtype="float32")
        return wav, sr
    except ImportError:
        import wave

        with wave.open(path, "rb") as w:
            sr = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
            width = w.getsampwidth()
            if width == 2:
                wav = np.frombuffer(raw, dtype=np.int16).astype(np.float32) / 32768.0
            elif width == 4:
                wav = np.frombuffer(raw, dtype=np.int32).astype(np.float32) / 2147483648.0
            else:
                raise ValueError(f"unsupported sample width {width}")
            if w.getnchannels() > 1:
                wav = wav.reshape(-1, w.getnchannels()).mean(axis=1)
        return wav, sr


# ----------------------------------------------------- feature transforms --

class UtteranceCMVN:
    """Per-utterance mean/variance normalization
    (feature_transforms/utterance_cmvn.py:9-41)."""

    def __init__(self, norm_means: bool = True, norm_vars: bool = True):
        self.norm_means, self.norm_vars = norm_means, norm_vars

    def __call__(self, x: np.ndarray) -> np.ndarray:
        mean = x.mean(axis=0)
        square_sums = (x ** 2).sum(axis=0)
        if self.norm_means:
            x = x - mean
        if self.norm_vars:
            var = square_sums / x.shape[0] - mean ** 2
            std = np.sqrt(np.maximum(var, 1e-10))
            x = x / std
        return x.astype(np.float32)


class SpecAugment:
    """SpecAugment freq/time masking (feature_transforms/specaugment.py).
    Applied on [T, F] host-side. Draw semantics mirror the reference
    exactly (exclusive-high widths, offsets drawn even for zero-width
    masks, early returns) so a shared RNG stream produces identical
    outputs — pinned by tests/test_reference_parity.py. Time WARP is not
    implemented (needs cv2, absent from this image; the DiffNorm recipes
    run with time_warp_W=0)."""

    def __init__(
        self,
        time_warp_w: int = 0,
        freq_mask_n: int = 0,
        freq_mask_f: int = 0,
        time_mask_n: int = 0,
        time_mask_t: int = 0,
        time_mask_p: float = 0.0,
        mask_value: Optional[float] = None,
    ):
        if time_warp_w > 0:
            raise NotImplementedError(
                "SpecAugment time warp (time_warp_W > 0) is not supported")
        if freq_mask_n > 0:
            assert freq_mask_f > 0, "freq_mask_F must be > 0 with freq masking"
        if time_mask_n > 0:
            assert time_mask_t > 0, "time_mask_T must be > 0 with time masking"
        self.freq_mask_n = freq_mask_n
        self.freq_mask_f = freq_mask_f
        self.time_mask_n = time_mask_n
        self.time_mask_t = time_mask_t
        self.time_mask_p = time_mask_p
        self.mask_value = mask_value

    def __call__(self, x: np.ndarray, rng: Optional[np.random.Generator] = None):
        rng = rng or np.random.default_rng()
        t, f = x.shape
        if t == 0 or f < self.freq_mask_f:
            return x
        x = x.copy()
        mask_value = x.mean() if self.mask_value is None else self.mask_value
        for _ in range(self.freq_mask_n):
            w = int(rng.integers(0, self.freq_mask_f))
            f0 = int(rng.integers(0, f - w))
            if w != 0:
                x[:, f0:f0 + w] = mask_value
        max_t = min(self.time_mask_t, math.floor(t * self.time_mask_p))
        if max_t < 1:
            return x
        for _ in range(self.time_mask_n):
            w = int(rng.integers(0, max_t))
            t0 = int(rng.integers(0, t - w))
            if w != 0:
                x[t0:t0 + w, :] = mask_value
        return x


class GlobalCMVN:
    """Global CMVN from precomputed stats npz (feature_transforms/global_cmvn.py)."""

    def __init__(self, stats_npz_path: str):
        stats = np.load(stats_npz_path)
        self.mean, self.std = stats["mean"], stats["std"]

    def __call__(self, x: np.ndarray) -> np.ndarray:
        return ((x - self.mean) / np.maximum(self.std, 1e-10)).astype(np.float32)


class DeltaDeltas:
    """Append delta and delta-delta features (feature_transforms/delta_deltas.py)."""

    def __init__(self, win: int = 2):
        self.win = win

    def __call__(self, x: np.ndarray) -> np.ndarray:
        def delta(feat):
            padded = np.pad(feat, ((self.win, self.win), (0, 0)), mode="edge")
            num = sum(
                n * (padded[self.win + n : self.win + n + feat.shape[0]] -
                     padded[self.win - n : self.win - n + feat.shape[0]])
                for n in range(1, self.win + 1)
            )
            denom = 2 * sum(n ** 2 for n in range(1, self.win + 1))
            return num / denom

        d1 = delta(x)
        d2 = delta(d1)
        return np.concatenate([x, d1, d2], axis=1).astype(np.float32)


# NoiseAugment / BabbleAugment / SporadicNoiseAugment (waveform) and
# ConcatAugment / NoisyOverlapAugment (dataset) live in
# diffnorm_tpu/data/augment.py with exact reference draw semantics.


def build_feature_transforms(cfg: dict, is_train: bool, rng=None) -> List:
    """Resolve the `transforms` block of a data config YAML
    (reference S2SDataConfig.get_feature_transforms, data_cfg.py)."""
    transforms_cfg = (cfg or {}).get("transforms", {})
    names = list(transforms_cfg.get("*", []))
    names += list(transforms_cfg.get("_train" if is_train else "_eval", []))
    out = []
    for name in names:
        if name == "utterance_cmvn":
            c = cfg.get("utterance_cmvn", {})
            out.append(UtteranceCMVN(
                c.get("norm_means", True), c.get("norm_vars", True)))
        elif name == "specaugment":
            # Defaults mirror the reference's from_config_dict (all zero —
            # a bare `specaugment:` block is a no-op there too).
            c = cfg.get("specaugment", {})
            out.append(SpecAugment(
                time_warp_w=c.get("time_warp_W", 0),
                freq_mask_n=c.get("freq_mask_N", 0),
                freq_mask_f=c.get("freq_mask_F", 0),
                time_mask_n=c.get("time_mask_N", 0),
                time_mask_t=c.get("time_mask_T", 0),
                time_mask_p=c.get("time_mask_p", 0.0),
                mask_value=c.get("mask_value"),
            ))
        elif name == "global_cmvn":
            out.append(GlobalCMVN(cfg["global_cmvn"]["stats_npz_path"]))
        elif name == "delta_deltas":
            # Reference win_length (torchaudio compute_deltas, default 5)
            # is the full tap count; ours is the half-window n_max.
            wl = (cfg.get("delta_deltas") or {}).get("win_length", 5)
            out.append(DeltaDeltas(win=(wl - 1) // 2))
        else:
            raise ValueError(f"unknown feature transform: {name}")
    return out
