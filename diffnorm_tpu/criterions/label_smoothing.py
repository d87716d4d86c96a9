"""Label-smoothed NLL loss, numerics-parity with
fairseq/criterions/label_smoothed_cross_entropy.py:label_smoothed_nll_loss."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def label_smoothed_nll_loss(lprobs, target, epsilon: float, ignore_index=None):
    """lprobs: [N, V] log-probs; target: [N] int. Returns (loss_sum, nll_sum).

    loss_i = (1 - eps - eps/(V-1)) * nll_i + eps/(V-1) * smooth_i
    where smooth_i = -sum_v lprobs[i, v]; positions with target==ignore_index
    contribute zero.
    """
    vocab = lprobs.shape[-1]
    target = target.astype(jnp.int32)
    nll = -jnp.take_along_axis(lprobs, target[:, None], axis=-1)[:, 0]
    smooth = -jnp.sum(lprobs, axis=-1)
    if ignore_index is not None:
        keep = target != ignore_index
        nll = jnp.where(keep, nll, 0.0)
        smooth = jnp.where(keep, smooth, 0.0)
    eps_i = epsilon / (vocab - 1)
    loss = (1.0 - epsilon - eps_i) * nll + eps_i * smooth
    return jnp.sum(loss), jnp.sum(nll)


def unit_accuracy(lprobs, target, ignore_index=0):
    """(n_correct, total) over positions where target != ignore_index."""
    pred = jnp.argmax(lprobs, axis=-1)
    keep = target != ignore_index
    n_correct = jnp.sum((pred == target) & keep)
    total = jnp.sum(keep)
    return n_correct, total
