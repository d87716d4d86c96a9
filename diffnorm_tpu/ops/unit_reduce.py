"""Unit reduction: collapse consecutive duplicate units, tracking durations
and kept indices.

Semantics parity with reference `_reduce_tgt`
(fairseq/data/audio/repr_to_repr_unit_dataset.py:92-113, duplicated in
research/TranSpeech/diff_norm_synthesis.py:25-46): keep the FIRST frame of
each run; durations are run lengths.

Two implementations:
* `reduce_units` — host numpy, exact, ragged output (data pipeline)
* `reduce_units_padded` — jit-able fixed-shape version (lax-friendly segment
  scan) for fused preprocessing graphs; returns padded arrays + count.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def reduce_units(tokens) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """tokens: 1-D int sequence. Returns (dedup, durations, index_to_keep)."""
    tokens = np.asarray(tokens)
    n = len(tokens)
    if n == 0:
        z = np.zeros((0,), dtype=np.int64)
        return z, z, z
    change = np.ones(n, dtype=bool)
    change[1:] = tokens[1:] != tokens[:-1]
    index_to_keep = np.nonzero(change)[0]
    dedup = tokens[index_to_keep]
    boundaries = np.append(index_to_keep, n)
    durations = np.diff(boundaries)
    return dedup, durations, index_to_keep


@jax.jit
def reduce_units_padded(tokens, valid_mask):
    """Jit-able reduction. tokens: [T] int32; valid_mask: [T] bool.

    Returns (reduced [T] padded with 0 after count, keep_mask [T],
    count scalar). reduced[i] for i < count are the dedup tokens packed left.
    """
    t = tokens.shape[0]
    prev = jnp.concatenate([jnp.full((1,), -1, tokens.dtype), tokens[:-1]])
    keep = (tokens != prev) & valid_mask
    # left-pack: position of each kept token in the output; non-kept tokens
    # scatter out of bounds and are dropped
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
    idx = jnp.where(keep, pos, t)
    out = jnp.zeros((t,), tokens.dtype).at[idx].set(tokens, mode="drop")
    return out, keep, jnp.sum(keep)


def expand_units(reduced, durations) -> np.ndarray:
    """Inverse of reduce: repeat each unit by its duration (host numpy;
    vocoder-side torch.repeat_interleave parity)."""
    return np.repeat(np.asarray(reduced), np.asarray(durations))
