"""Unit LM dataset: unit sequences from translation manifests, optionally
re-blocked into fixed token blocks via the native token_block_slices op
(reference: fairseq token_block_utils_fast + LM datasets)."""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List

import numpy as np

from diffnorm_tpu.data.dictionary import Dictionary
from diffnorm_tpu.data.manifest import read_translation_manifest


def token_block_slices(sizes: np.ndarray, block_size: int) -> np.ndarray:
    """[n_blocks, 4] (start_doc, start_off, end_doc, end_off); native C++
    with a numpy fallback."""
    from diffnorm_tpu.data.batching import _load_native

    sizes = np.asarray(sizes, np.int64)
    total = int(sizes.sum())
    n_blocks = (total + block_size - 1) // block_size
    lib = _load_native()
    if lib:
        out = np.zeros((n_blocks * 4,), np.int64)
        lib.token_block_slices.restype = ctypes.c_long
        lib.token_block_slices.argtypes = [
            ctypes.POINTER(ctypes.c_long), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_long),
        ]
        n = lib.token_block_slices(
            sizes.ctypes.data_as(ctypes.POINTER(ctypes.c_long)), len(sizes),
            block_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        return out[: n * 4].reshape(-1, 4)
    # numpy fallback
    slices = []
    doc, off = 0, 0
    for _ in range(n_blocks):
        start = (doc, off)
        remaining = min(block_size, total)
        total -= remaining
        while remaining > 0 and doc < len(sizes):
            avail = sizes[doc] - off
            if avail > remaining:
                off += remaining
                remaining = 0
            else:
                remaining -= avail
                doc += 1
                off = 0
        slices.append([*start, doc, off])
    return np.asarray(slices, np.int64)


class UnitLMDataset:
    def __init__(
        self,
        unit_seqs: List[np.ndarray],  # dictionary-encoded
        block_size: int = 0,
        is_train: bool = True,
        seed: int = 1,
    ):
        if block_size:
            stream_sizes = np.asarray([len(u) for u in unit_seqs])
            blocks = token_block_slices(stream_sizes, block_size)
            flat = np.concatenate(unit_seqs) if unit_seqs else np.zeros(0, np.int32)
            offsets = np.concatenate([[0], np.cumsum(stream_sizes)])
            seqs = []
            for sd, so, ed, eo in blocks:
                a = offsets[sd] + so
                b = (offsets[ed] + eo) if ed < len(unit_seqs) else offsets[-1]
                seqs.append(flat[a:b])
            unit_seqs = seqs
        self.unit_seqs = unit_seqs
        self.is_train = is_train
        self.shuffle = is_train
        self.seed = seed
        self._sizes = np.asarray([len(u) for u in unit_seqs], np.int64)

    def __len__(self):
        return len(self.unit_seqs)

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
        return np.lexsort((order, -self._sizes))

    def __getitem__(self, index: int) -> Dict:
        return {"index": index, "units": self.unit_seqs[index]}

    def collater(self, samples: List[Dict]) -> Dict:
        lens = np.asarray([len(s["units"]) for s in samples], np.int32)
        out = np.zeros((len(samples), int(lens.max())), np.int32)
        for i, s in enumerate(samples):
            out[i, : lens[i]] = s["units"]
        return {
            "id": np.asarray([s["index"] for s in samples], np.int64),
            "target_unit": out,
            "target_lengths": lens,
            "ntokens": int(lens.sum()),
            "nsentences": len(samples),
        }

    @classmethod
    def from_tsv(
        cls,
        root: str,
        split: str,
        tgt_dict: Dictionary,
        max_positions: int = 1024,
        block_size: int = 0,
        is_train: bool = True,
        seed: int = 1,
    ) -> "UnitLMDataset":
        rows = read_translation_manifest(os.path.join(root, f"{split}.tsv"))
        seqs = []
        for row in rows:
            enc = tgt_dict.encode_line(row["tgt_audio"], append_eos=False)
            seqs.append(enc[:max_positions].astype(np.int32))
        return cls(seqs, block_size=block_size, is_train=is_train, seed=seed)
