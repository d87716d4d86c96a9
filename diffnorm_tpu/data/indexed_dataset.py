"""Memory-mapped indexed datasets (reference: fairseq/data/indexed_dataset.py
MMapIndexedDataset + builder): token sequences binarized to a flat .bin of
int32 plus an .idx with per-sequence offsets. Zero-copy reads via np.memmap.
"""

from __future__ import annotations

import os
import struct
from typing import List

import numpy as np

MAGIC = b"DNTPUIDX1"


class IndexedDatasetBuilder:
    def __init__(self, prefix: str, dtype=np.int32):
        self.prefix = prefix
        self.dtype = np.dtype(dtype)
        self._bin = open(prefix + ".bin", "wb")
        self._sizes: List[int] = []

    def add_item(self, tokens: np.ndarray):
        arr = np.asarray(tokens, dtype=self.dtype)
        self._bin.write(arr.tobytes())
        self._sizes.append(len(arr))

    def finalize(self):
        self._bin.close()
        with open(self.prefix + ".idx", "wb") as f:
            f.write(MAGIC)
            f.write(struct.pack("<B", self.dtype.itemsize))
            f.write(struct.pack("<q", len(self._sizes)))
            np.asarray(self._sizes, np.int64).tofile(f)


class IndexedDataset:
    def __init__(self, prefix: str):
        with open(prefix + ".idx", "rb") as f:
            magic = f.read(len(MAGIC))
            assert magic == MAGIC, f"bad index file {prefix}.idx"
            itemsize = struct.unpack("<B", f.read(1))[0]
            n = struct.unpack("<q", f.read(8))[0]
            self.sizes = np.fromfile(f, np.int64, n)
        self.dtype = {4: np.int32, 8: np.int64, 2: np.int16}[itemsize]
        self.offsets = np.concatenate([[0], np.cumsum(self.sizes)])
        self._data = np.memmap(prefix + ".bin", dtype=self.dtype, mode="r")

    def __len__(self):
        return len(self.sizes)

    def __getitem__(self, i: int) -> np.ndarray:
        return np.asarray(self._data[self.offsets[i]: self.offsets[i + 1]])

    def num_tokens(self, i: int) -> int:
        return int(self.sizes[i])


def binarize_file(
    text_path: str, out_prefix: str, dictionary, append_eos: bool = True
) -> int:
    """Line file -> indexed dataset; returns sequence count
    (reference fairseq_cli/preprocess.py Binarizer path)."""
    builder = IndexedDatasetBuilder(out_prefix)
    n = 0
    with open(text_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            builder.add_item(dictionary.encode_line(line, append_eos=append_eos))
            n += 1
    builder.finalize()
    return n
