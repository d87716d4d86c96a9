"""Repr->repr-unit dataset for the VAE and diffusion stages.

Capability parity with fairseq/data/audio/repr_to_repr_unit_dataset.py:
joins the translation manifest `{root}/{split}.tsv` with per-utterance
mHuBERT feature dumps (feature manifest `{feat_dir}/{split}.manifest.tsv`
pointing at `{id}.feat.npy`), derives reduced units + kept frame indices, and
collates zero-padded batches sorted by descending source length. dev/test
splits cap at 4000 samples (reference :365-368).

The VAE/diffusion criterions only consume the *target*-side reduced
features/units; source features are loaded lazily only when requested
(`with_source=True`) — a deviation from the reference, which always loads
both (src is dead weight in its VAE recipe).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import (
    read_feature_manifest,
    read_translation_manifest,
)
from diffnorm_tpu.ops.unit_reduce import reduce_units


class ReprToReprUnitDataset:
    def __init__(
        self,
        ids: List[str],
        tgt_feat_paths: List[str],
        tgt_units: List[List[int]],
        tgt_dict: Dictionary,
        src_feat_paths: Optional[List[str]] = None,
        is_train: bool = True,
        with_source: bool = False,
        seed: int = 1,
        bucket: bool = True,
    ):
        self.ids = ids
        self.tgt_feat_paths = tgt_feat_paths
        self.tgt_units = tgt_units
        self.tgt_dict = tgt_dict
        self.src_feat_paths = src_feat_paths
        self.is_train = is_train
        self.with_source = with_source and src_feat_paths is not None
        self.shuffle = is_train
        self.seed = seed
        # bucket padded lengths so jit sees a handful of shapes (the TPU
        # tunnel makes recompiles minutes-expensive)
        self.bucket = bucket
        self._sizes = np.asarray([len(u) for u in tgt_units], dtype=np.int64)

    # ----------------------------------------------------------- protocol
    def __len__(self):
        return len(self.ids)

    def num_tokens(self, index: int) -> int:
        return int(self._sizes[index])

    @property
    def sizes(self):
        return self._sizes

    def ordered_indices(self) -> np.ndarray:
        if self.shuffle:
            order = np.random.default_rng(self.seed).permutation(len(self))
        else:
            order = np.arange(len(self))
        # stable sort by descending frame count (reference :177-183)
        return np.lexsort((order, -self._sizes))

    def __getitem__(self, index: int) -> Dict:
        tgt_feat = np.load(self.tgt_feat_paths[index]).astype(np.float32)
        units = np.asarray(self.tgt_units[index], dtype=np.int64)
        dedup, durations, index_to_keep = reduce_units(units)
        # dictionary mapping: unit k -> index k + 4 (no eos appended)
        target_unit = units + self.tgt_dict.nspecial
        reduce_unit = dedup + self.tgt_dict.nspecial
        item = {
            "index": index,
            "id": self.ids[index],
            "tgt_feat": tgt_feat,
            "tgt_unit": target_unit.astype(np.int32),
            "reduce_tgt_unit": reduce_unit.astype(np.int32),
            "reduce_tgt_feat": tgt_feat[index_to_keep],
            "durations": durations.astype(np.int32),
            "index_to_keep": index_to_keep,
        }
        if self.with_source:
            item["src_feat"] = np.load(self.src_feat_paths[index]).astype(np.float32)
        return item

    # ----------------------------------------------------------- collate
    def collater(self, samples: List[Dict]) -> Dict:
        if not samples:
            return {}
        # sort by descending reduced length (reference sorts by src length;
        # target-side training only needs a deterministic order)
        samples = sorted(
            samples, key=lambda s: s["reduce_tgt_feat"].shape[0], reverse=True
        )
        bsz = len(samples)
        feat_dim = samples[0]["tgt_feat"].shape[1]

        tgt_lens = np.asarray([s["tgt_feat"].shape[0] for s in samples], np.int32)
        red_lens = np.asarray(
            [s["reduce_tgt_unit"].shape[0] for s in samples], np.int32
        )
        max_tgt, max_red = int(tgt_lens.max()), int(red_lens.max())
        if self.bucket:
            from diffnorm_tpu.data.batching import bucket_length

            max_tgt, max_red = bucket_length(max_tgt), bucket_length(max_red)

        target = np.zeros((bsz, max_tgt, feat_dim), np.float32)
        target_unit = np.zeros((bsz, max_tgt), np.int32)
        reduce_feat = np.zeros((bsz, max_red, feat_dim), np.float32)
        reduce_unit = np.zeros((bsz, max_red), np.int32)
        for i, s in enumerate(samples):
            target[i, : tgt_lens[i]] = s["tgt_feat"]
            target_unit[i, : tgt_lens[i]] = s["tgt_unit"]
            reduce_feat[i, : red_lens[i]] = s["reduce_tgt_feat"]
            reduce_unit[i, : red_lens[i]] = s["reduce_tgt_unit"]

        batch = {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "target": target,
            "target_unit": target_unit,
            "target_lengths": tgt_lens,
            "reduce_target": reduce_feat,
            "reduce_target_unit": reduce_unit,
            "reduce_target_lengths": red_lens,
            "ntokens": int(red_lens.sum()),
            "nsentences": bsz,
        }
        if self.with_source:
            src_lens = np.asarray([s["src_feat"].shape[0] for s in samples], np.int32)
            src = np.zeros((bsz, int(src_lens.max()), feat_dim), np.float32)
            for i, s in enumerate(samples):
                src[i, : src_lens[i]] = s["src_feat"]
            batch["src_tokens"] = src
            batch["src_lengths"] = src_lens
        return batch

    # ----------------------------------------------------------- loading
    @classmethod
    def from_tsv(
        cls,
        root: str,
        tgt_feat_dir: str,
        split: str,
        tgt_dict: Dictionary,
        src_feat_dir: Optional[str] = None,
        is_train: bool = True,
        max_samples: Optional[int] = None,
        with_source: bool = False,
        seed: int = 1,
    ) -> "ReprToReprUnitDataset":
        tgt_manifest = read_feature_manifest(
            os.path.join(tgt_feat_dir, f"{split}.manifest.tsv")
        )
        src_manifest = (
            read_feature_manifest(os.path.join(src_feat_dir, f"{split}.manifest.tsv"))
            if src_feat_dir
            else None
        )
        rows = read_translation_manifest(os.path.join(root, f"{split}.tsv"))
        ids, tgt_paths, units, src_paths = [], [], [], []
        for row in rows:
            utt = row["id"]
            if utt not in tgt_manifest:
                continue
            if src_manifest is not None and utt not in src_manifest:
                continue
            toks = [int(x) for x in row["tgt_audio"].split()]
            path, feat_len = tgt_manifest[utt]
            if len(toks) != feat_len:
                continue
            ids.append(utt)
            tgt_paths.append(path)
            units.append(toks)
            if src_manifest is not None:
                src_paths.append(src_manifest[utt][0])
            if max_samples and len(ids) > max_samples:
                break
        return cls(
            ids=ids,
            tgt_feat_paths=tgt_paths,
            tgt_units=units,
            tgt_dict=tgt_dict,
            src_feat_paths=src_paths or None,
            is_train=is_train,
            with_source=with_source,
            seed=seed,
        )
