"""Corpus BLEU over unit sequences.

Replaces fairseq's `fairseq.libbleu` scorer (fairseq/clib/libbleu) with the
native counters in csrc/diffnorm_data.cpp; a pure-python fallback keeps the
API alive without the .so. BLEU-4 with brevity penalty, matching the
standard corpus formulation the reference's scorers/bleu.py computes.
"""

from __future__ import annotations

import ctypes
import math
from collections import Counter
from typing import List, Sequence


class BleuAccumulator:
    def __init__(self):
        from diffnorm_tpu.data.batching import _load_native

        self._lib = _load_native() or None
        if self._lib:
            self._lib.bleu_stat_size.restype = ctypes.c_long
            self._stat = ctypes.create_string_buffer(self._lib.bleu_stat_size())
            self._lib.bleu_zero(self._stat)
        else:
            self.reflen = self.predlen = 0
            self.match = [0] * 4
            self.total = [0] * 4
        self._vocab = {}

    def _ids(self, toks: Sequence[str]) -> List[int]:
        out = []
        for t in toks:
            if t not in self._vocab:
                self._vocab[t] = len(self._vocab) + 10  # avoid pad=1/eos=2
            out.append(self._vocab[t])
        return out

    def add(self, ref: Sequence[str], hyp: Sequence[str]):
        import numpy as np

        r = self._ids(list(ref))
        h = self._ids(list(hyp))
        if self._lib:
            ra = np.asarray(r, np.int32)
            ha = np.asarray(h, np.int32)
            self._lib.bleu_add(
                self._stat,
                ra.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(ra),
                ha.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(ha),
                ctypes.c_int(-1), ctypes.c_int(-2),
            )
            return
        self.reflen += len(r)
        self.predlen += len(h)
        for n in range(1, 5):
            rn = Counter(tuple(r[i:i + n]) for i in range(len(r) - n + 1))
            hn = Counter(tuple(h[i:i + n]) for i in range(len(h) - n + 1))
            for g, c in hn.items():
                self.total[n - 1] += c
                self.match[n - 1] += min(c, rn.get(g, 0))

    def _counts(self):
        if self._lib:
            import numpy as np

            out = np.zeros(10, np.int64)
            self._lib.bleu_counts(
                self._stat, out.ctypes.data_as(ctypes.POINTER(ctypes.c_long))
            )
            reflen, predlen = int(out[0]), int(out[1])
            match = [int(out[2 + 2 * i]) for i in range(4)]
            total = [int(out[3 + 2 * i]) for i in range(4)]
            return reflen, predlen, match, total
        return self.reflen, self.predlen, self.match, self.total

    def score(self, order: int = 4) -> float:
        assert 1 <= order <= 4, "counters track ngrams up to order 4"
        reflen, predlen, match, total = self._counts()
        if predlen == 0:
            return 0.0
        log_p = 0.0
        for m, t in zip(match[:order], total[:order]):
            if t == 0 or m == 0:  # unsmoothed corpus BLEU
                return 0.0
            log_p += math.log(m / t) / order
        bp = 1.0 if predlen >= reflen else math.exp(1 - reflen / max(predlen, 1))
        return 100.0 * bp * math.exp(log_p)

    def precisions(self, order: int = 4) -> List[float]:
        _, _, match, total = self._counts()
        return [100.0 * m / t if t else 0.0
                for m, t in zip(match[:order], total[:order])]

    def result_string(self, order: int = 4) -> str:
        reflen, predlen, match, total = self._counts()
        p = "/".join(f"{x:.1f}" for x in self.precisions(order))
        ratio = predlen / max(reflen, 1)
        return (f"BLEU{order} = {self.score(order):.2f}, {p} "
                f"(ratio={ratio:.3f}, hyp_len={predlen}, ref_len={reflen})")


def corpus_bleu(refs: List[str], hyps: List[str]) -> float:
    """sacrebleu when available (reference research/utils/unit_bleu.py path),
    else the native accumulator."""
    try:
        import sacrebleu

        return sacrebleu.corpus_bleu(hyps, [refs]).score
    except ImportError:
        acc = BleuAccumulator()
        for r, h in zip(refs, hyps):
            acc.add(r.split(), h.split())
        return acc.score()
