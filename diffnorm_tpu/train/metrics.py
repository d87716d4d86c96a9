"""Metric aggregation (reference: fairseq/logging/metrics.py, meters.py).

Host-side, hierarchical like the reference but much smaller: a
`MetricsAggregator` accumulates weighted scalar sums; nested `aggregate()`
contexts mirror fairseq's thread-local aggregator stack so a criterion's
step metrics land in both the epoch and the interval aggregator.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class MetricsAggregator:
    def __init__(self):
        self._sum: Dict[str, float] = defaultdict(float)
        self._weight: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, float] = defaultdict(float)

    def log_scalar(self, key: str, value: float, weight: float = 1.0):
        value = float(value)
        weight = float(weight)
        self._sum[key] += value * weight
        self._weight[key] += weight

    def log_sum(self, key: str, value: float):
        self._counts[key] += float(value)

    def log_dict(self, metrics: Dict[str, float], weight_key: str = "sample_size"):
        w = float(metrics.get(weight_key, 1.0))
        for k, v in metrics.items():
            if k in ("ntokens", "nsentences", "sample_size"):
                self.log_sum(k, v)
            else:
                self.log_scalar(k, v, w)

    def get_smoothed_values(self) -> Dict[str, float]:
        out = {}
        for k, s in self._sum.items():
            w = self._weight[k]
            out[k] = s / w if w > 0 else 0.0
        out.update(self._counts)
        return out

    def reset(self):
        self._sum.clear()
        self._weight.clear()
        self._counts.clear()


_STACK: list = []


@contextlib.contextmanager
def aggregate(agg: Optional[MetricsAggregator] = None):
    agg = agg or MetricsAggregator()
    _STACK.append(agg)
    try:
        yield agg
    finally:
        _STACK.pop()


def log_dict(metrics: Dict[str, float]):
    for agg in _STACK:
        agg.log_dict(metrics)


class StopwatchMeter:
    """Wall-clock meter (reference fairseq/logging/meters.py StopwatchMeter)."""

    def __init__(self):
        self.sum = 0.0
        self.n = 0
        self._start = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self, n: int = 1):
        if self._start is not None:
            self.sum += time.perf_counter() - self._start
            self.n += n
            self._start = None

    @property
    def avg(self) -> float:
        return self.sum / self.n if self.n else 0.0
