"""Speech-to-unit dataset for NAR S2UT training.

Capability parity with research/TranSpeech/dataset.py +
fairseq/data/audio/speech_to_speech_dataset.py: 80-d fbank source (computed
from audio or loaded from .npy), unit targets encoded through the dictionary
with EOS appended (speech_to_speech_dataset.py:138-141), pad=1; the collater
sorts by descending source frames and exposes target/target_lengths for the
NAT decoder. Feature transforms (utterance CMVN + SpecAugment on train
splits) come from the `config.yaml` S2SDataConfig block (data_cfg.py).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from diffnorm_tpu.data.audio import build_feature_transforms, get_features_or_waveform
from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import read_translation_manifest

PAD = 1


class SpeechToUnitDataset:
    def __init__(
        self,
        ids: List[str],
        src_audio_paths: List[str],
        src_n_frames: List[int],
        tgt_units: List[np.ndarray],  # already dictionary-encoded, EOS appended
        tgt_dict: Dictionary,
        data_cfg: Optional[dict] = None,
        is_train: bool = True,
        seed: int = 1,
        bucket: bool = True,
    ):
        self.ids = ids
        self.src_audio_paths = src_audio_paths
        self.src_n_frames = np.asarray(src_n_frames, dtype=np.int64)
        self.tgt_units = tgt_units
        self.tgt_dict = tgt_dict
        self.is_train = is_train
        self.shuffle = is_train
        self.seed = seed
        self.data_cfg = data_cfg or {}
        self.bucket = bucket  # pad to length buckets -> few jit shapes
        self._rng = np.random.default_rng(seed)
        self.feature_transforms = build_feature_transforms(
            self.data_cfg, is_train=is_train
        )
        from diffnorm_tpu.data.augment import build_dataset_transforms

        # concataugment support (reference SpeechToTextDataset.__getitem__
        # concatenates a partner sample's source and target)
        self.dataset_transforms = build_dataset_transforms(
            self.data_cfg, is_train=is_train
        )
        # --multitask-config-yaml aux text targets, keyed by task name
        # (reference SpeechToSpeechMultitaskDataset,
        # speech_to_speech_dataset.py:333-387)
        self.multitask_data: Dict[str, Dict] = {}
        # target_speaker_embed (reference speech_to_speech_dataset.py:90-96):
        # per-utterance speaker-embedding paths, joined by id from the
        # {split}.tsv inside the configured directory
        self.tgt_speakers: Optional[List[str]] = None

    def add_multitask(self, name: str, text_data, decoder_type: str):
        """Attach one aux task's per-sample text targets (TextTargetData)."""
        self.multitask_data[name] = {
            "data": text_data,
            "with_prev": decoder_type != "ctc",
        }

    def __len__(self):
        return len(self.ids)

    def num_tokens(self, index: int) -> int:
        return int(self.src_n_frames[index])

    def size(self, index: int):
        """(src_frames, tgt_len) — filter-by-size compares per component
        against (max_source_positions, max_target_positions), the reference
        SpeechToSpeechDataset.size semantics."""
        return int(self.src_n_frames[index]), len(self.tgt_units[index])

    @property
    def sizes(self):
        return self.src_n_frames

    def ordered_indices(self) -> np.ndarray:
        if self.shuffle:
            order = np.random.default_rng(self.seed).permutation(len(self))
        else:
            order = np.arange(len(self))
        return np.lexsort((order, -self.src_n_frames))

    def __getitem__(self, index: int) -> Dict:
        from diffnorm_tpu.data.augment import ConcatAugment, get_transform

        concat = get_transform(self.dataset_transforms, ConcatAugment)
        indices = [index]
        if concat is not None:
            indices = concat.find_indices(
                index, self.src_n_frames, len(self), rng=self._rng)
        # use_audio_input (reference data_cfg.py:116-119): feed the raw
        # waveform as [T, 1] instead of fbank features (CTC/wav2vec-style
        # fine-tune); feature transforms don't apply to waveforms
        raw_audio = bool(self.data_cfg.get("use_audio_input", False))
        feat = np.concatenate([
            np.asarray(get_features_or_waveform(self.src_audio_paths[i],
                                                need_waveform=raw_audio),
                       dtype=np.float32)
            for i in indices
        ], axis=0)
        if raw_audio:
            if feat.ndim == 1:
                feat = feat[:, None]
            sample = {
                "index": index,
                "source": feat,
                "target": self.tgt_units[index],
            }
            # the collater stacks tgt_speaker unconditionally when configured
            # — omitting it here would KeyError when both options are on
            if self.tgt_speakers is not None:
                sample["tgt_speaker"] = np.asarray(
                    get_features_or_waveform(self.tgt_speakers[index]),
                    np.float32).reshape(-1)
            return sample
        if len(indices) == 1:
            target = self.tgt_units[index]
        else:
            # stored sequences carry a trailing EOS; the reference joins the
            # raw token texts before encoding, so strip the first's EOS
            target = np.concatenate(
                [self.tgt_units[indices[0]][:-1]]
                + [self.tgt_units[i] for i in indices[1:]])
        from diffnorm_tpu.data.audio import SpecAugment

        for t in self.feature_transforms:
            if isinstance(t, SpecAugment):
                feat = t(feat, rng=self._rng)
            else:
                feat = t(feat)
        sample = {
            "index": index,
            "source": feat,
            "target": target,
        }
        if self.tgt_speakers is not None:
            sample["tgt_speaker"] = np.asarray(
                get_features_or_waveform(self.tgt_speakers[index]),
                np.float32).reshape(-1)
        if self.multitask_data:
            sample["multitask"] = {}
            for name, mt in self.multitask_data.items():
                enc = mt["data"].get(self.ids[index])
                if enc is None:  # reference warns and uses an empty target
                    enc = np.zeros((0,), np.int32)
                sample["multitask"][name] = enc
        return sample

    def collater(self, samples: List[Dict]) -> Dict:
        if not samples:
            return {}
        samples = sorted(samples, key=lambda s: s["source"].shape[0], reverse=True)
        bsz = len(samples)
        src_lens = np.asarray([s["source"].shape[0] for s in samples], np.int32)
        tgt_lens = np.asarray([len(s["target"]) for s in samples], np.int32)
        feat_dim = samples[0]["source"].shape[1]
        max_src, max_tgt = int(src_lens.max()), int(tgt_lens.max())
        if self.bucket:
            from diffnorm_tpu.data.batching import bucket_length

            max_src, max_tgt = bucket_length(max_src), bucket_length(max_tgt)
        src = np.zeros((bsz, max_src, feat_dim), np.float32)
        tgt = np.full((bsz, max_tgt), PAD, np.int32)
        for i, s in enumerate(samples):
            src[i, : src_lens[i]] = s["source"]
            tgt[i, : tgt_lens[i]] = s["target"]
        batch = {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "src_tokens": src,
            "src_lengths": src_lens,
            "target": tgt,
            "target_lengths": tgt_lens,
            "ntokens": int(tgt_lens.sum()),
            "nsentences": bsz,
        }
        if self.tgt_speakers is not None:
            # reference collater emits tgt_speaker [B, D]
            # (speech_to_speech_dataset.py:219-229)
            batch["tgt_speaker"] = np.stack(
                [s["tgt_speaker"] for s in samples]).astype(np.float32)
        if self.multitask_data:
            from diffnorm_tpu.data.multitask import collate_text_targets

            batch["multitask"] = {}
            for name, mt in self.multitask_data.items():
                targets = [s["multitask"][name] for s in samples]
                pad_to = max(1, max(len(t) for t in targets))
                if self.bucket:
                    from diffnorm_tpu.data.batching import bucket_length

                    pad_to = bucket_length(pad_to)
                batch["multitask"][name] = collate_text_targets(
                    targets, with_prev=mt["with_prev"], pad_to=pad_to
                )
        return batch

    @classmethod
    def from_tsv(
        cls,
        root: str,
        split: str,
        tgt_dict: Dictionary,
        config_yaml: str = "config.yaml",
        is_train: bool = True,
        seed: int = 1,
    ) -> "SpeechToUnitDataset":
        rows = read_translation_manifest(os.path.join(root, f"{split}.tsv"))
        data_cfg = {}
        cfg_path = os.path.join(root, config_yaml)
        if os.path.exists(cfg_path):
            import yaml

            with open(cfg_path) as f:
                data_cfg = yaml.safe_load(f) or {}
        ids, paths, n_frames, units = [], [], [], []
        audio_root = data_cfg.get("audio_root", root)
        for row in rows:
            ids.append(row["id"])
            p = row["src_audio"]
            paths.append(p if os.path.isabs(p) else os.path.join(audio_root, p))
            n_frames.append(int(row["src_n_frames"]))
            enc = tgt_dict.encode_line(row["tgt_audio"], append_eos=True)
            units.append(enc.astype(np.int32))
        tgt_speakers = None
        spk_dir = data_cfg.get("target_speaker_embed")
        if spk_dir:
            # reference speech_to_speech_dataset.py:90-96: join a
            # {split}.tsv (columns id / speaker_embed) by utterance id
            import csv

            if not os.path.isabs(spk_dir):
                spk_dir = os.path.join(root, spk_dir)
            with open(os.path.join(spk_dir, f"{split}.tsv")) as f:
                spk_rows = list(csv.DictReader(f, delimiter="\t"))
            spk_map = {r["id"]: r["speaker_embed"] for r in spk_rows}
            tgt_speakers = [
                p if os.path.isabs(p) else os.path.join(spk_dir, p)
                for p in (spk_map[i] for i in ids)
            ]
        ds = cls(
            ids=ids,
            src_audio_paths=paths,
            src_n_frames=n_frames,
            tgt_units=units,
            tgt_dict=tgt_dict,
            data_cfg=data_cfg,
            is_train=is_train,
            seed=seed,
        )
        ds.tgt_speakers = tgt_speakers
        return ds
