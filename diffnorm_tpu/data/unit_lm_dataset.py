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


def slice_indices(sizes: np.ndarray, break_mode: str, block_size: int,
                  document_sep_len: int = 1) -> np.ndarray:
    """[n_blocks, 2] token-space (start, end) pairs over the concatenated
    stream — the reference `_get_slice_indices_fast` semantics
    (fairseq/data/token_block_utils_fast.pyx:52-106):

    * none — fixed block_size windows across sequence boundaries
    * complete — greedy groups of COMPLETE sequences up to block_size
      (a sequence longer than block_size gets its own block)
    * complete_doc — like complete but never crossing document separators
      (a sequence of exactly document_sep_len tokens ends a document);
      single-token groups are dropped like the reference's `curr_size > 1`
    * eos — one sequence per block
    """
    sizes = np.asarray(sizes, np.int64)
    if break_mode in (None, "none"):
        quads = token_block_slices(sizes, block_size)
        offsets = np.concatenate([[0], np.cumsum(sizes)])
        n_seq = len(sizes)
        out = np.zeros((len(quads), 2), np.int64)
        for i, (sd, so, ed, eo) in enumerate(quads):
            out[i, 0] = offsets[sd] + so
            out[i, 1] = (offsets[ed] + eo) if ed < n_seq else offsets[-1]
        return out
    if break_mode == "complete":
        pairs = []
        tok_idx = curr = 0
        for sz in sizes:
            if curr + sz <= block_size or curr == 0:
                curr += int(sz)
            else:
                pairs.append((tok_idx, tok_idx + curr))
                tok_idx += curr
                curr = int(sz)
        if curr > 0:
            pairs.append((tok_idx, tok_idx + curr))
        return np.asarray(pairs, np.int64).reshape(-1, 2)
    if break_mode == "complete_doc":
        pairs = []
        tok_idx = curr = 0
        sz_idx = 0
        n = len(sizes)
        while sz_idx < n:
            sz = int(sizes[sz_idx])
            if ((curr + sz <= block_size or curr == 0)
                    and sz != document_sep_len):
                curr += sz
                sz_idx += 1
            else:
                if curr > 1:
                    pairs.append((tok_idx, tok_idx + curr))
                tok_idx += curr
                curr = 0
                if sz == document_sep_len:
                    tok_idx += sz
                    sz_idx += 1
        if curr > 1:
            pairs.append((tok_idx, tok_idx + curr))
        return np.asarray(pairs, np.int64).reshape(-1, 2)
    if break_mode == "eos":
        cumsum = np.concatenate([[0], np.cumsum(sizes)])
        return np.stack([cumsum[:-1], cumsum[1:]], axis=1)
    raise ValueError(f"Invalid break_mode: {break_mode}")


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
        break_mode: str = "none",
        is_train: bool = True,
        seed: int = 1,
    ):
        if block_size:
            stream_sizes = np.asarray([len(u) for u in unit_seqs])
            pairs = slice_indices(stream_sizes, break_mode, block_size)
            flat = np.concatenate(unit_seqs) if unit_seqs else np.zeros(0, np.int32)
            unit_seqs = [flat[a:b] for a, b in pairs]
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
        break_mode: str = "none",
        is_train: bool = True,
        seed: int = 1,
    ) -> "UnitLMDataset":
        rows = read_translation_manifest(os.path.join(root, f"{split}.tsv"))
        seqs = []
        for row in rows:
            enc = tgt_dict.encode_line(row["tgt_audio"], append_eos=False)
            seqs.append(enc[:max_positions].astype(np.int32))
        return cls(seqs, block_size=block_size, break_mode=break_mode,
                   is_train=is_train, seed=seed)
