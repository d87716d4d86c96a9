"""Stacked-unit support (n_frames_per_step > 1).

Capability parity with fairseq's stacked-unit machinery
(fairseq/models/speech_to_speech/modules/stacked_embedding.py +
fairseq/tasks/speech_to_speech.py:31-137 StackUnitSequenceGenerator):
k consecutive units pack into one token id base-V (above the 4 specials);
embedding unpacks, embeds each sub-unit, concatenates and projects; greedy
generation emits k sub-frames per decoder step and re-packs.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

PAD, BOS, EOS, UNK = 1, 0, 2, 3
OFFSET = 4  # specials


def pack_units(units, vocab_size: int, n: int):
    """units: [..., n] raw unit ids (0..V-1) -> packed dictionary ids."""
    scale = jnp.asarray(
        [vocab_size ** (n - 1 - i) for i in range(n)], jnp.int32
    )
    return jnp.sum(units * scale, axis=-1) + OFFSET


def unpack_units(tokens, vocab_size: int, n: int):
    """packed dictionary ids -> [..., n] raw unit ids; specials pass through
    unchanged in every slot (StackedEmbedding.forward parity)."""
    is_unit = tokens >= OFFSET
    val = jnp.maximum(tokens - OFFSET, 0)
    outs = []
    for i in range(n):
        div = vocab_size ** (n - 1 - i)
        sub = (val // div) % vocab_size
        outs.append(jnp.where(is_unit, sub + OFFSET, tokens))
    return jnp.stack(outs, axis=-1)


class StackedEmbedding(nn.Module):
    """Packed token -> single embedding via per-sub-unit embed + projection."""

    num_embeddings: int  # sub-unit dictionary size (V + 4)
    embed_dim: int
    num_stacked: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens):
        embed = nn.Embed(
            self.num_embeddings, self.embed_dim,
            embedding_init=nn.initializers.normal(self.embed_dim ** -0.5),
            dtype=self.dtype, name="embed",
        )
        if self.num_stacked == 1:
            return embed(tokens)
        vocab = self.num_embeddings - OFFSET
        sub = unpack_units(tokens, vocab, self.num_stacked)
        e = embed(sub)  # [..., n, D]
        e = e.reshape(e.shape[:-2] + (self.num_stacked * self.embed_dim,))
        return nn.Dense(
            self.embed_dim, use_bias=False, dtype=self.dtype,
            name="project_in_dim",
        )(e)


def stack_unit_generate(
    decode_step: Callable,
    batch_size: int,
    vocab_size: int,
    n_frames_per_step: int,
    max_len: int = 256,
    init_state=None,
):
    """Greedy stacked-unit generation (StackUnitSequenceGenerator parity).

    decode_step(state, prev_packed [B], position [B]) -> (logits [B, n, V+4],
    state) for the n sub-frames of this step; `state` (e.g. the decoder KV
    cache) threads through the lax.scan carry — closure-mutated Python state
    would NOT update across scan iterations. Emits until every row produced
    EOS in any sub-frame or max_len steps; finished rows freeze.
    Returns (packed tokens [B, max_len], sub_units [B, max_len, n]).
    """

    def body(carry, step):
        prev, finished, state = carry
        logits, state = decode_step(
            state, prev, jnp.full((batch_size,), step)
        )
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        lp = lp.at[..., PAD].set(-jnp.inf).at[..., UNK].set(-jnp.inf)
        sub = jnp.argmax(lp, axis=-1).astype(jnp.int32)  # [B, n]
        hit_eos = jnp.any(sub == EOS, axis=-1)
        packed = pack_units(
            jnp.maximum(sub - OFFSET, 0), vocab_size, n_frames_per_step
        )
        packed = jnp.where(finished | hit_eos, PAD, packed)
        sub_out = jnp.where(finished[:, None] | hit_eos[:, None], PAD, sub)
        new_finished = finished | hit_eos
        return (jnp.where(new_finished, jnp.full_like(packed, EOS), packed),
                new_finished, state), (packed, sub_out)

    init = (jnp.full((batch_size,), EOS, jnp.int32),
            jnp.zeros((batch_size,), bool), init_state)
    _, (packed_seq, sub_seq) = jax.lax.scan(
        body, init, jnp.arange(max_len)
    )
    return packed_seq.T, jnp.moveaxis(sub_seq, 0, 1)
