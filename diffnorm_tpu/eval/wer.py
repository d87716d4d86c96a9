"""Word-error-rate scorer (reference fairseq/scoring/wer.py: editdistance
over whitespace words, summed distance / summed reference length). The
edit distance runs in the native library (csrc:edit_distance_batch) with a
numpy DP fallback."""

from __future__ import annotations

import ctypes

import numpy as np

PAD_ID = 0  # internal pad for the word-id matrices (word ids start at 1)


def _edit_distance_rows(refs: np.ndarray, hyps: np.ndarray) -> np.ndarray:
    """refs [B, R], hyps [B, H] int32 padded with PAD_ID -> [B] distances."""
    from diffnorm_tpu.data.batching import _load_native

    refs = np.ascontiguousarray(refs, np.int32)
    hyps = np.ascontiguousarray(hyps, np.int32)
    b, rlen = refs.shape
    hlen = hyps.shape[1]
    out = np.zeros((b,), np.int64)
    lib = _load_native()
    if lib:
        lib.edit_distance_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_long, ctypes.c_long, ctypes.c_long, ctypes.c_int,
            ctypes.POINTER(ctypes.c_long),
        ]
        lib.edit_distance_batch(
            refs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            hyps.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
            b, rlen, hlen, PAD_ID,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        )
        return out
    for s in range(b):
        r = refs[s][refs[s] != PAD_ID]
        h = hyps[s][hyps[s] != PAD_ID]
        prev = np.arange(len(h) + 1, dtype=np.int64)
        for i in range(1, len(r) + 1):
            cur = np.empty_like(prev)
            cur[0] = i
            for j in range(1, len(h) + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (r[i - 1] != h[j - 1]))
            prev = cur
        out[s] = prev[-1]
    return out


class WerAccumulator:
    """Corpus WER: per-pair word edit distance / total reference words."""

    def __init__(self):
        self.distance = 0
        self.ref_length = 0

    def add(self, ref: str, hyp: str):
        ref_words = ref.split()
        hyp_words = hyp.split()
        vocab = {w: i + 1 for i, w in enumerate(dict.fromkeys(
            ref_words + hyp_words))}
        r = np.asarray([[vocab[w] for w in ref_words]
                        + [PAD_ID] * max(len(hyp_words) - len(ref_words), 0)],
                       np.int32)
        h = np.asarray([[vocab[w] for w in hyp_words]
                        + [PAD_ID] * max(len(ref_words) - len(hyp_words), 0)],
                       np.int32)
        self.distance += int(_edit_distance_rows(r, h)[0])
        self.ref_length += len(ref_words)

    def score(self) -> float:
        return 100.0 * self.distance / max(self.ref_length, 1)

    def result_string(self) -> str:
        return f"WER: {self.score():.2f}"
