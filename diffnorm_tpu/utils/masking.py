"""Length/mask helpers (reference: fairseq/data/data_utils.py lengths_to_mask).

All masks here are boolean [B, T]; `True` marks a *valid* position for
`lengths_to_mask` and a *padded* position for `lengths_to_padding_mask`,
matching the reference's two conventions.
"""

from __future__ import annotations

import jax.numpy as jnp


def lengths_to_mask(lengths, max_len: int | None = None):
    """[B] lengths -> [B, T] bool mask, True where t < length."""
    lengths = jnp.asarray(lengths)
    if max_len is None:
        max_len = int(lengths.max())
    pos = jnp.arange(max_len)[None, :]
    return pos < lengths[:, None]


def lengths_to_padding_mask(lengths, max_len: int | None = None):
    """[B] lengths -> [B, T] bool mask, True where t >= length (padding)."""
    return ~lengths_to_mask(lengths, max_len)


def apply_mask(x, mask, fill=0.0):
    """Zero (or fill) padded positions. mask: [B, T] True=valid; x: [B, T, ...]."""
    while mask.ndim < x.ndim:
        mask = mask[..., None]
    return jnp.where(mask, x, fill)
