"""Unit<->waveform dataset for vocoder fine-tuning.

Capability parity with the reference's unit-to-speech data path
(fairseq/tasks/code_hifigan.py "unit_to_speech" + the CodeDataset of the
vendored TranSpeech hifigan trainer): pairs a `name|u1 u2 ...` units file
with 16 kHz waveforms; training samples are random fixed-length unit crops
with the aligned waveform segment (320 samples per unit at 50 Hz / 16 kHz),
so every batch is one static shape.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from diffnorm_tpu.data.audio import read_audio

SAMPLES_PER_UNIT = 320  # 16000 Hz / 50 Hz unit rate


def read_units_file(path: str) -> Dict[str, np.ndarray]:
    out = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            name, units = line.split("|", 1)
            out[name] = np.asarray([int(x) for x in units.split()], np.int32)
    return out


class CodeToSpeechDataset:
    def __init__(
        self,
        names: List[str],
        audio_paths: List[str],
        units: List[np.ndarray],
        crop_units: int = 32,
        is_train: bool = True,
        seed: int = 1,
        dedup_dur: bool = False,
        data_cfg: Optional[Dict] = None,
    ):
        from diffnorm_tpu.data.augment import (
            build_dataset_transforms,
            build_waveform_transforms,
        )

        self.names = names
        self.audio_paths = audio_paths
        self.units = units
        self.crop_units = crop_units
        self.is_train = is_train
        self.shuffle = is_train
        self._rng = np.random.default_rng(seed)
        self.seed = seed
        # emit run-length duration labels for dur-predictor fine-tuning
        # (reference hubert_to_speech.py:67-92: -100 marks masked slots)
        self.dedup_dur = dedup_dur
        # noise/babble/sporadic waveform augments on the crop; batch-level
        # noisy-overlap in the collater (reference wires these through
        # S2TDataConfig.get_{waveform,dataset}_transforms)
        self.waveform_transforms = build_waveform_transforms(
            data_cfg or {}, is_train)
        self.dataset_transforms = build_dataset_transforms(
            data_cfg or {}, is_train)

    def __len__(self):
        return len(self.names)

    def num_tokens(self, index: int) -> int:
        return self.crop_units

    @property
    def sizes(self):
        return np.full((len(self),), self.crop_units, np.int64)

    def ordered_indices(self) -> np.ndarray:
        if self.shuffle:
            return np.random.default_rng(self.seed).permutation(len(self))
        return np.arange(len(self))

    def __getitem__(self, index: int) -> Dict:
        wav, sr = read_audio(self.audio_paths[index])
        assert sr == 16000, f"expected 16 kHz, got {sr}"
        units = self.units[index]
        n = self.crop_units
        if len(units) > n and self.is_train:
            start = int(self._rng.integers(0, len(units) - n))
        else:
            start = 0
        u = units[start:start + n]
        seg = wav[start * SAMPLES_PER_UNIT: (start + n) * SAMPLES_PER_UNIT]
        if len(u) < n:  # pad short utterances
            u = np.pad(u, (0, n - len(u)))
        want = n * SAMPLES_PER_UNIT
        if len(seg) < want:
            seg = np.pad(seg, (0, want - len(seg)))
        for t in self.waveform_transforms:
            seg, _ = t(seg, 16000, rng=self._rng)
        item = {"index": index, "code": u.astype(np.int32),
                "wav": np.asarray(seg, np.float32)}
        if self.dedup_dur:
            # reduced units + run lengths of the crop window; the duration
            # predictor sees the reduced sequence (its synthesis-time input)
            # and -100 marks padded slots (reference duration mask)
            edges = np.concatenate([[True], u[1:] != u[:-1]])
            uniq = u[edges].astype(np.int32)
            durs = np.diff(np.concatenate(
                [np.nonzero(edges)[0], [len(u)]])).astype(np.int32)
            dur_code = np.zeros((n,), np.int32)
            durations = np.full((n,), -100, np.int32)
            k = min(len(uniq), n)
            dur_code[:k] = uniq[:k]
            durations[:k] = durs[:k]
            item["dur_code"] = dur_code
            item["durations"] = durations
        return item

    def collater(self, samples: List[Dict]) -> Dict:
        from diffnorm_tpu.data.augment import NoisyOverlapAugment, get_transform

        wavs = [s["wav"] for s in samples]
        noa = get_transform(self.dataset_transforms, NoisyOverlapAugment)
        if noa is not None:
            wavs = [np.asarray(w, np.float32) for w in noa(wavs, rng=self._rng)]
        batch = {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "code": np.stack([s["code"] for s in samples]),
            "wav": np.stack(wavs),
            "ntokens": len(samples) * self.crop_units,
            "nsentences": len(samples),
        }
        if "durations" in samples[0]:
            batch["dur_code"] = np.stack([s["dur_code"] for s in samples])
            batch["durations"] = np.stack([s["durations"] for s in samples])
        return batch

    @classmethod
    def from_files(
        cls,
        units_file: str,
        audio_dir: str,
        crop_units: int = 32,
        is_train: bool = True,
        audio_suffix: str = ".wav",
        seed: int = 1,
        dedup_dur: bool = False,
        data_cfg: Optional[Dict] = None,
    ) -> "CodeToSpeechDataset":
        units_map = read_units_file(units_file)
        names, paths, units = [], [], []
        for name, u in units_map.items():
            p = os.path.join(audio_dir, name + audio_suffix)
            if os.path.exists(p):
                names.append(name)
                paths.append(p)
                units.append(u)
        return cls(names, paths, units, crop_units=crop_units,
                   is_train=is_train, seed=seed, dedup_dur=dedup_dur,
                   data_cfg=data_cfg)


class FeatureToSpeechDataset(CodeToSpeechDataset):
    """Continuous-feature -> waveform pairs for repr_to_speech vocoder
    fine-tuning (reference repr_to_speech_dataset.py): per-utterance
    `{id}.feat.npy` (50 Hz frames, 320 samples each) aligned with 16 kHz
    audio, random fixed-length crops."""

    def __init__(self, names, audio_paths, feat_paths, crop_units: int = 32,
                 is_train: bool = True, seed: int = 1):
        super().__init__(names, audio_paths, [None] * len(names),
                         crop_units=crop_units, is_train=is_train, seed=seed)
        self.feat_paths = feat_paths

    def __getitem__(self, index: int) -> Dict:
        wav, sr = read_audio(self.audio_paths[index])
        assert sr == 16000
        feat = np.load(self.feat_paths[index]).astype(np.float32)
        n = self.crop_units
        if len(feat) > n and self.is_train:
            start = int(self._rng.integers(0, len(feat) - n))
        else:
            start = 0
        f = feat[start:start + n]
        seg = wav[start * SAMPLES_PER_UNIT: (start + n) * SAMPLES_PER_UNIT]
        if len(f) < n:
            f = np.pad(f, ((0, n - len(f)), (0, 0)))
        want = n * SAMPLES_PER_UNIT
        if len(seg) < want:
            seg = np.pad(seg, (0, want - len(seg)))
        return {"index": index, "features": f, "wav": seg.astype(np.float32)}

    def collater(self, samples: List[Dict]) -> Dict:
        return {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "features": np.stack([s["features"] for s in samples]),
            "wav": np.stack([s["wav"] for s in samples]),
            "ntokens": len(samples) * self.crop_units,
            "nsentences": len(samples),
        }

    @classmethod
    def from_manifest(cls, feat_manifest: str, audio_dir: str,
                      crop_units: int = 32, is_train: bool = True,
                      audio_suffix: str = ".wav", seed: int = 1):
        from diffnorm_tpu.data.manifest import read_feature_manifest

        m = read_feature_manifest(feat_manifest)
        names, apaths, fpaths = [], [], []
        for utt, (fpath, _) in m.items():
            ap = os.path.join(audio_dir, utt + audio_suffix)
            if os.path.exists(ap):
                names.append(utt)
                apaths.append(ap)
                fpaths.append(fpath)
        return cls(names, apaths, fpaths, crop_units=crop_units,
                   is_train=is_train, seed=seed)
