"""Length/mask helpers (reference: fairseq/data/data_utils.py lengths_to_mask).

All masks here are boolean [B, T]; `True` marks a *valid* position for
`lengths_to_mask` and a *padded* position for `lengths_to_padding_mask`,
matching the reference's two conventions.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


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


def compute_mask_indices(
    shape,
    padding_mask,
    mask_prob: float,
    mask_length: int,
    mask_type: str = "static",
    mask_other: float = 0.0,
    min_masks: int = 0,
    no_overlap: bool = False,
    min_space: int = 0,
    require_same_masks: bool = True,
    mask_dropout: float = 0.0,
    rng=None,
) -> np.ndarray:
    """wav2vec2/HuBERT span masking — exact reference draw semantics
    (fairseq/data/data_utils.py:393-527 compute_mask_indices), host-side.

    shape = (B, T); padding_mask: optional bool [B, T], True = PADDED.
    Returns bool [B, T], True = masked. With `rng=None` the legacy global
    `np.random` stream is used in the reference's exact call order, so a
    shared `np.random.seed` reproduces the reference's masks bit-for-bit
    (pinned in tests/test_hubert_pretrain.py); pass a
    `np.random.Generator` for an explicitly seeded production stream (same
    algorithm, different stream).

    Spans: `mask_prob * T / mask_length (+ rand for probabilistic
    rounding)` start points per row (recomputed per row from its unpadded
    length when padding_mask is given), span lengths by `mask_type`
    (static / uniform / normal / poisson), starts drawn without
    replacement from [0, sz - min_len), spans clipped to the row and
    deduplicated, then every row subsampled down to the batch-minimum
    mask count (`require_same_masks`) so masked-position tensors stay
    rectangular.
    """
    r = np.random if rng is None else rng
    # legacy global np.random (parity stream) and np.random.Generator spell
    # uniform/int draws differently
    _rand = r.rand if rng is None else r.random
    _randint = r.randint if rng is None else (
        lambda lo, hi, size=None: r.integers(lo, hi, size=size))
    bsz, all_sz = shape
    mask = np.zeros((bsz, all_sz), dtype=bool)

    # probabilistic rounding: one shared draw when there is no padding
    all_num_mask = int(mask_prob * all_sz / float(mask_length) + _rand())
    all_num_mask = max(min_masks, all_num_mask)

    row_idcs = []
    for i in range(bsz):
        if padding_mask is not None:
            sz = int(all_sz - np.asarray(padding_mask[i]).sum())
            num_mask = int(mask_prob * sz / float(mask_length) + _rand())
            num_mask = max(min_masks, num_mask)
        else:
            sz = all_sz
            num_mask = all_num_mask

        if mask_type == "static":
            lengths = np.full(num_mask, mask_length)
        elif mask_type == "uniform":
            lengths = _randint(mask_other, mask_length * 2 + 1, size=num_mask)
        elif mask_type == "normal":
            lengths = r.normal(mask_length, mask_other, size=num_mask)
            lengths = [max(1, int(round(x))) for x in lengths]
        elif mask_type == "poisson":
            lengths = r.poisson(mask_length, size=num_mask)
            lengths = [int(round(x)) for x in lengths]
        else:
            raise ValueError(f"unknown mask type {mask_type}")
        lengths = list(lengths)

        if sum(lengths) == 0:
            lengths[0] = min(mask_length, sz - 1)

        if no_overlap:
            # recursive free-interval placement (reference :469-497); the
            # reference's own branch crashes on the removed np.int alias
            # under numpy 2 — same algorithm, working dtype here
            idc: list = []
            parts = [(0, sz)]
            min_length = min(lengths)
            for length in sorted(lengths, reverse=True):
                lens = np.array(
                    [e - s if e - s >= length + min_space else 0
                     for s, e in parts], dtype=np.int64)
                l_sum = lens.sum()
                if l_sum == 0:
                    break
                probs = lens / l_sum
                c = r.choice(len(parts), p=probs)
                s, e = parts.pop(c)
                span_start = int(_randint(s, e - length))
                idc.extend(span_start + j for j in range(length))
                if span_start - s - min_space >= min_length:
                    parts.append((s, span_start - min_space + 1))
                if e - span_start - min_length - min_space > min_length:
                    parts.append((span_start + length + min_space, e))
            mask_idc = np.asarray(idc)
        else:
            min_len = min(lengths)
            if sz - min_len <= num_mask:
                min_len = sz - num_mask - 1
            starts = r.choice(sz - min_len, num_mask, replace=False)
            mask_idc = np.asarray([
                starts[j] + offset
                for j in range(len(starts))
                for offset in range(lengths[j])
            ])

        row_idcs.append(np.unique(mask_idc[mask_idc < sz]))

    min_count = min(len(m) for m in row_idcs)
    for i, idc in enumerate(row_idcs):
        if len(idc) > min_count and require_same_masks:
            idc = r.choice(idc, min_count, replace=False)
        if mask_dropout > 0:
            num_holes = np.rint(len(idc) * mask_dropout).astype(int)
            idc = r.choice(idc, len(idc) - num_holes, replace=False)
        mask[i, idc] = True

    return mask
