"""Epoch batch iteration with checkpointable position.

Capability parity with fairseq/data/iterators.py (EpochBatchIterator /
CountingIterator / GroupedIterator): deterministic per-epoch shuffling from
(seed, epoch), resume mid-epoch from a saved offset, grouping into
update_freq microbatch lists, and a background prefetch thread standing in
for the reference's multi-worker DataLoader.
"""

from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional

import numpy as np

logger = logging.getLogger("diffnorm_tpu.data")


class CountingIterator:
    def __init__(self, iterable, start: int = 0, total: Optional[int] = None):
        self._it = iter(iterable)
        self.n = start
        self.total = total

    def __iter__(self):
        return self

    def __next__(self):
        x = next(self._it)
        self.n += 1
        return x

    def has_next(self) -> bool:
        return self.total is None or self.n < self.total


class GroupedIterator:
    """Yield lists of `chunk_size` items (grad-accumulation microbatches)."""

    def __init__(self, iterable, chunk_size: int):
        self._it = iter(iterable)
        self.chunk_size = chunk_size

    def __iter__(self):
        return self

    def __next__(self):
        chunk = []
        try:
            for _ in range(self.chunk_size):
                chunk.append(next(self._it))
        except StopIteration:
            if not chunk:
                raise
        return chunk


class _Prefetcher:
    """Background-thread batch prefetch (host-side collation overlaps with
    device compute; replaces torch DataLoader workers)."""

    def __init__(self, make_iter: Callable[[], Iterator], depth: int = 4):
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._done = object()
        self._finished = False
        self._thread = threading.Thread(
            target=self._run, args=(make_iter,), daemon=True
        )
        self._thread.start()

    def _run(self, make_iter):
        try:
            for item in make_iter():
                self.q.put(item)
        finally:
            self.q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        # iterator protocol: an exhausted iterator must KEEP raising
        # StopIteration — the sentinel is consumed exactly once, so a
        # second q.get() would block forever (hit by read-ahead wrappers
        # like cli/generate prefetching; deadlocked the e2e pipeline)
        if self._finished:
            raise StopIteration
        item = self.q.get()
        if item is self._done:
            self._finished = True
            raise StopIteration
        return item


def pool_map_ordered(fn, items, workers: int, depth: int):
    """Yield fn(item) in order with up to `depth` jobs in flight across
    `workers` threads — the fairseq --num-workers DataLoader analog.

    Worker threads do HOST work only (dataset reads + numpy collation;
    np.load/soundfile/fbank release the GIL) — jax calls must stay on the
    main thread (a worker-thread device_put racing a main-thread compile
    deadlocks, see CLAUDE.md). Results come back in submission order, so
    batch order — and therefore checkpoint-resume offsets — match the
    sequential path exactly."""
    from concurrent.futures import ThreadPoolExecutor

    from collections import deque

    with ThreadPoolExecutor(max_workers=workers) as ex:
        futs, it = deque(), iter(items)
        try:
            for _ in range(max(depth, 1)):
                futs.append(ex.submit(fn, next(it)))
        except StopIteration:
            it = None
        while futs:
            out = futs.popleft().result()
            if it is not None:
                try:
                    futs.append(ex.submit(fn, next(it)))
                except StopIteration:
                    it = None
            yield out


def read_ahead(iterable, prep: Callable[[Any], Any], depth: int = 2):
    """Yield `prep(item)` in order, keeping up to `depth` prepped items in
    flight ahead of the consumer.

    The single shared implementation of the fill-then-refill read-ahead
    loop (device-upload prefetch in the train/generate loops). Never calls
    next() again after the first StopIteration — the iterator-protocol
    subtlety that deadlocked _Prefetcher-backed iterators."""
    from collections import deque

    buf, it, done = deque(), iter(iterable), False
    while not done and len(buf) < max(depth, 1):
        try:
            buf.append(prep(next(it)))
        except StopIteration:
            done = True
    while buf:
        out = buf.popleft()
        if not done:
            try:
                buf.append(prep(next(it)))
            except StopIteration:
                done = True
        yield out


class EpochBatchIterator:
    """Batches a map-style dataset with `collater`, deterministic shuffle,
    resumable position.

    dataset protocol: __len__, __getitem__(i) -> sample, collater(samples),
    ordered_indices() -> np.ndarray, num_tokens(i) -> int.
    """

    def __init__(
        self,
        dataset,
        max_tokens: Optional[int] = None,
        max_sentences: Optional[int] = None,
        required_batch_size_multiple: int = 1,
        seed: int = 1,
        shuffle: bool = True,
        num_prefetch: int = 4,
        num_workers: int = 0,
        max_positions: Optional[int] = None,
        ignore_invalid_inputs: bool = False,
        curriculum: int = 0,
    ):
        from diffnorm_tpu.data.batching import batch_by_size

        self.dataset = dataset
        self.max_tokens = max_tokens
        self.max_sentences = max_sentences
        self.mult = required_batch_size_multiple
        self.seed = seed
        self.shuffle = shuffle
        self.num_prefetch = num_prefetch
        self.num_workers = num_workers
        self.max_positions = max_positions
        self.ignore_invalid_inputs = ignore_invalid_inputs
        self.curriculum = curriculum
        self.epoch = 1
        self._offset = 0
        self._batch_by_size = batch_by_size
        self._batches: Optional[List[np.ndarray]] = None
        self._active: Optional[CountingIterator] = None
        self._trained: Optional[int] = None  # set by mark_trained

    # ------------------------------------------------------------ batching
    def _make_batches(self, epoch: int) -> List[np.ndarray]:
        indices = self.dataset.ordered_indices()
        sizes = np.asarray([self.dataset.num_tokens(int(i)) for i in range(len(self.dataset))])
        if self.max_positions is not None:
            # fairseq filter_indices_by_size (fairseq_task.py:167-199): train
            # iterators skip with a warning (ignore_invalid_inputs=True);
            # valid/test raise unless --skip-invalid-size-inputs-valid-test.
            # Datasets exposing size(i) tuples are compared per component
            # against a (max_source, max_target) tuple; scalar num_tokens
            # falls back to the min of the set components (conservative).
            mp = self.max_positions
            size_fn = getattr(self.dataset, "size", None)

            def invalid(i):
                if size_fn is not None and isinstance(mp, (tuple, list)):
                    sz = size_fn(int(i))
                    if not isinstance(sz, (tuple, list)):
                        sz = (sz,)
                    return any(m is not None and s > m
                               for s, m in zip(sz, mp))
                cap = (min(m for m in mp if m is not None)
                       if isinstance(mp, (tuple, list)) else mp)
                return sizes[int(i)] > cap

            ignored = [int(i) for i in indices if invalid(i)]
            if ignored:
                if not self.ignore_invalid_inputs:
                    sz0 = (size_fn(ignored[0]) if size_fn is not None
                           else sizes[ignored[0]])
                    raise ValueError(
                        f"Size of sample #{ignored[0]} is invalid (={sz0}) "
                        f"since max_positions={mp}, skip this example with "
                        "--skip-invalid-size-inputs-valid-test")
                logger.warning(
                    "%d samples have invalid sizes and will be skipped, "
                    "max_positions=%s, first few sample ids=%s",
                    len(ignored), mp, ignored[:10])
                bad = set(ignored)
                indices = np.asarray(
                    [i for i in indices if int(i) not in bad])
        batches = self._batch_by_size(
            indices,
            sizes,
            max_tokens=self.max_tokens,
            max_sentences=self.max_sentences,
            required_batch_size_multiple=self.mult,
        )
        # --curriculum N: in-order batches for the first N epochs
        # (reference fairseq_cli/train.py:253)
        if self.shuffle and epoch > self.curriculum:
            rng = np.random.default_rng((self.seed, epoch))
            order = rng.permutation(len(batches))
            batches = [batches[i] for i in order]
        return batches

    def __len__(self):
        if self._batches is None:
            self._batches = self._make_batches(self.epoch)
        return len(self._batches)

    # ----------------------------------------------------------- iteration
    def next_epoch_itr(self, shuffle: bool = True) -> CountingIterator:
        self.shuffle = self.shuffle and shuffle
        self._batches = self._make_batches(self.epoch)
        start = self._offset

        def load(batch_idx):
            idxs = self._batches[batch_idx]
            samples = [self.dataset[int(i)] for i in idxs]
            return self.dataset.collater(samples)

        def gen():
            for batch_idx in range(start, len(self._batches)):
                yield load(batch_idx)

        if self.num_workers > 1:
            # fairseq --num-workers: parallel host-side loading/collation
            # (ordered, so resume offsets match the sequential path; note
            # datasets drawing augmentations from a shared RNG see a
            # different draw order — same caveat as torch DataLoader workers)
            it = pool_map_ordered(
                load, range(start, len(self._batches)), self.num_workers,
                depth=self.num_prefetch + self.num_workers)
        elif self.num_prefetch > 0:
            it = _Prefetcher(gen, depth=self.num_prefetch)
        else:
            it = gen()
        counting = CountingIterator(it, start=start, total=len(self._batches))
        self._active = counting
        self._trained = None  # set by mark_trained (read-ahead consumers)
        return counting

    def mark_trained(self, n_batches: int):
        """Record batches actually TRAINED this epoch.

        Read-ahead wrappers (parallel.mesh.prefetch_to_device) pull batches
        from the iterator before they are trained, so CountingIterator.n
        overcounts by the prefetch depth; a checkpoint taken mid-epoch would
        then skip never-trained batches on resume. Train loops call this
        per step and state_dict prefers it."""
        if self._trained is None:
            self._trained = self._offset
        self._trained += n_batches

    def end_of_epoch(self) -> bool:
        return self._active is not None and not self._active.has_next()

    def finish_epoch(self):
        self.epoch += 1
        self._offset = 0
        self._batches = None
        # drop the exhausted iterator: a save after finish_epoch must record
        # the reset offset (0 into the next epoch), not the stale full-epoch
        # batch count (which would make a resumed run skip the whole epoch)
        self._active = None
        self._trained = None

    # ------------------------------------------------------------ state
    def state_dict(self) -> Dict[str, Any]:
        if getattr(self, "_trained", None) is not None:
            offset = self._trained
        elif getattr(self, "_active", None):
            offset = self._active.n
        else:
            offset = self._offset
        return {"epoch": self.epoch, "offset": offset, "seed": self.seed}

    def load_state_dict(self, state: Dict[str, Any]):
        self.epoch = state.get("epoch", 1)
        self._offset = state.get("offset", 0)
        # a stale trained-count from before the restore would make
        # mark_trained resume from the wrong base (and state_dict prefer it)
        self._trained = None
        self._batches = None
