"""Length-bucketed batch construction.

Capability parity with fairseq's `batch_by_size`
(fairseq/data/data_utils_fast.pyx:9-124): group sorted indices into batches
bounded by max_tokens (= max_len-in-batch * batch_size, since batches pad to
the longest member) and/or max_sentences, with an optional
required-batch-size-multiple.

A C++ implementation (csrc/batching.cpp, loaded via ctypes) accelerates the
hot loop for million-utterance manifests; the numpy fallback is exact.
TPU addition: `bucket_lengths` quantizes padded lengths to a fixed set of
buckets so jit sees a small number of shapes (XLA recompiles per shape).
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence

import numpy as np

_LIB = None


def _load_native():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "csrc",
        "libdiffnorm_data.so",
    )
    if os.path.exists(path):
        lib = ctypes.CDLL(path)
        lib.batch_by_size.restype = ctypes.c_long
        lib.batch_by_size.argtypes = [
            ctypes.POINTER(ctypes.c_long),  # indices
            ctypes.POINTER(ctypes.c_long),  # sizes (aligned with indices)
            ctypes.c_long,                  # n
            ctypes.c_long,                  # max_tokens
            ctypes.c_long,                  # max_sentences
            ctypes.c_long,                  # bsz_multiple
            ctypes.POINTER(ctypes.c_long),  # out batch boundaries
        ]
        _LIB = lib
    else:
        _LIB = False
    return _LIB


def batch_by_size(
    indices: np.ndarray,
    sizes: np.ndarray,
    max_tokens: Optional[int] = None,
    max_sentences: Optional[int] = None,
    required_batch_size_multiple: int = 1,
) -> List[np.ndarray]:
    """indices: candidate order (e.g. length-sorted); sizes: per-index size.
    Returns a list of index arrays."""
    indices = np.asarray(indices, dtype=np.int64)
    sizes_for = np.asarray(sizes, dtype=np.int64)[indices]
    mt = int(max_tokens) if max_tokens else 0
    ms = int(max_sentences) if max_sentences else 0
    mult = max(int(required_batch_size_multiple), 1)

    lib = _load_native()
    if lib:
        bounds = np.zeros(len(indices) + 1, dtype=np.int64)
        n_b = lib.batch_by_size(
            indices.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            sizes_for.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            len(indices), mt, ms, mult,
            bounds.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        return [
            indices[bounds[i]:bounds[i + 1]] for i in range(n_b)
        ]
    return _batch_by_size_py(indices, sizes_for, mt, ms, mult)


def _batch_by_size_py(indices, sizes, max_tokens, max_sentences, mult):
    batches = []
    batch: List[tuple] = []  # (index, size)
    batch_max_len = 0
    for idx, size in zip(indices, sizes):
        size = int(size)
        new_max = max(batch_max_len, size)
        overflow = (
            (max_tokens and (len(batch) + 1) * new_max > max_tokens)
            or (max_sentences and len(batch) + 1 > max_sentences)
        )
        if overflow and batch:
            # close at the largest multiple of `mult` (fairseq semantics);
            # the remainder seeds the next batch
            keep = (len(batch) // mult) * mult if len(batch) >= mult else len(batch)
            batches.append(np.asarray([i for i, _ in batch[:keep]], dtype=np.int64))
            batch = batch[keep:]
            batch_max_len = max((s for _, s in batch), default=0)
        batch.append((int(idx), size))
        batch_max_len = max(batch_max_len, size)
    if batch:
        batches.append(np.asarray([i for i, _ in batch], dtype=np.int64))
    return batches


BUCKETS_DEFAULT = (32, 64, 96, 128, 192, 256, 384, 512, 768, 1024, 1536, 2048,
                   3072, 4096, 6144)


def bucket_length(n: int, buckets: Sequence[int] = BUCKETS_DEFAULT) -> int:
    """Smallest bucket >= n (caps jit shape count; TPU-specific)."""
    for b in buckets:
        if n <= b:
            return b
    return int(np.ceil(n / buckets[-1]) * buckets[-1])
