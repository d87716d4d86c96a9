"""HuBERT pretraining dataset (reference fairseq/data/audio/hubert_dataset.py):
raw 16 kHz waveforms from a wav2vec-style manifest TSV (first line = root
dir, then "relpath\tnum_samples") paired with frame-level k-means labels
(one space-separated line per utterance in `{split}.{label}`), encoded
through the unit Dictionary (+4 specials offset).

TPU redesign: the reference crops every batch to its shortest sample
(dynamic shapes); here every row is random-cropped (train) or
prefix-cropped (valid) to ONE static `max_sample_size` canvas and shorter
rows are padded with a validity length — the trainer's XLA programs then
never retrace. Labels are aligned to conv-extractor frames at
`label_rate` (feat2tar ratio, reference hubert.py forward_targets
:397-410) at collate time.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from diffnorm_tpu.data.audio import read_audio
from diffnorm_tpu.models.hubert import CONV_LAYERS, frames_for_samples


def _host_frames_for_samples(n: int, conv_layers=None) -> int:
    return max(frames_for_samples(n, conv_layers), 0)


class HubertPretrainDataset:
    def __init__(
        self,
        audio_paths: List[str],
        n_samples: List[int],
        labels: Optional[List[np.ndarray]] = None,
        max_sample_size: int = 250_000,
        min_sample_size: int = 32_000,
        sample_rate: int = 16_000,
        label_rate: float = 50.0,
        normalize: bool = False,
        is_train: bool = True,
        random_crop: bool = True,
        seed: int = 1,
        conv_layers=None,
    ):
        keep = [i for i, n in enumerate(n_samples) if n >= min_sample_size]
        self.audio_paths = [audio_paths[i] for i in keep]
        self.n_samples = [n_samples[i] for i in keep]
        # labels=None -> raw-audio pretraining (wav2vec2: no frame targets)
        self.labels = None if labels is None else [labels[i] for i in keep]
        self.max_sample_size = max_sample_size
        self.sample_rate = sample_rate
        self.label_rate = label_rate
        self.normalize = normalize
        self.is_train = is_train
        self.random_crop = random_crop
        self._rng = np.random.default_rng(seed)
        # the conv spec must match the model's --conv-feature-layers
        # (default: 320x downsample at 16 kHz -> 50 Hz frames)
        self.conv_layers = tuple(conv_layers) if conv_layers else CONV_LAYERS
        self.feat2tar_ratio = (
            label_rate * int(np.prod([s for _, _, s in self.conv_layers]))
            / sample_rate)
        self.n_frames = _host_frames_for_samples(
            max_sample_size, self.conv_layers)

    def __len__(self):
        return len(self.audio_paths)

    def num_tokens(self, index: int) -> int:
        return min(self.n_samples[index], self.max_sample_size)

    @property
    def sizes(self):
        return np.minimum(np.asarray(self.n_samples), self.max_sample_size)

    def ordered_indices(self) -> np.ndarray:
        order = np.argsort(self.sizes, kind="stable")
        return order[::-1].copy()

    def __getitem__(self, index: int) -> Dict:
        wav, sr = read_audio(self.audio_paths[index])
        assert sr == self.sample_rate, f"expected {self.sample_rate}, got {sr}"
        if self.normalize:
            wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
        canvas = self.max_sample_size
        if len(wav) > canvas:
            start = (int(self._rng.integers(0, len(wav) - canvas + 1))
                     if self.is_train and self.random_crop else 0)
            wav = wav[start:start + canvas]
        else:
            start = 0
        n_valid = len(wav)
        if n_valid < canvas:
            wav = np.pad(wav, (0, canvas - n_valid))
        out = {
            "index": index,
            "wav": np.asarray(wav, np.float32),
            "length": n_valid,
        }
        if self.labels is None:
            return out
        # frame-aligned label window for the crop
        label = self.labels[index]
        lab_start = int(round(start / self.sample_rate * self.label_rate))
        frames = self.n_frames
        inds = (lab_start
                + (np.arange(frames) * self.feat2tar_ratio).astype(np.int64))
        target = np.full((frames,), -1, np.int64)
        ok = inds < len(label)
        target[ok] = label[inds[ok]]
        # frames beyond the valid waveform are invalid regardless of labels
        valid_frames = _host_frames_for_samples(n_valid, self.conv_layers)
        target[valid_frames:] = -1
        out["target"] = target
        return out

    def collater(self, samples: List[Dict]) -> Dict:
        batch = {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "src_tokens": np.stack([s["wav"] for s in samples]),
            "src_lengths": np.asarray(
                [s["length"] for s in samples], np.int32),
            "nsentences": len(samples),
        }
        if self.labels is None:
            # masked-frame count isn't known until prepare_batch draws the
            # span mask; valid frames is the stable token measure
            batch["ntokens"] = int(sum(
                _host_frames_for_samples(int(s["length"]), self.conv_layers)
                for s in samples))
            return batch
        batch["target"] = np.stack([s["target"] for s in samples])
        batch["ntokens"] = int(sum(
            (np.asarray(s["target"]) >= 0).sum() for s in samples))
        return batch

    @classmethod
    def from_manifest(
        cls,
        manifest: str,
        label_file: Optional[str] = None,
        tgt_dict=None,
        **kwargs,
    ) -> "HubertPretrainDataset":
        with open(manifest) as f:
            root = f.readline().strip()
            paths, ns = [], []
            for line in f:
                if not line.strip():
                    continue
                p, n = line.rstrip("\n").split("\t")
                paths.append(os.path.join(root, p) if root else p)
                ns.append(int(n))
        if label_file is None:
            return cls(paths, ns, None, **kwargs)
        labels = []
        with open(label_file) as f:
            for line in f:
                labels.append(np.asarray(
                    tgt_dict.encode_line(line.strip(), append_eos=False),
                    np.int64))
        assert len(labels) == len(paths), (
            f"{len(paths)} audio rows vs {len(labels)} label rows")
        return cls(paths, ns, labels, **kwargs)
