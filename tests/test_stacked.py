"""Stacked-unit pack/unpack round trips, StackedEmbedding, greedy stacked
generation."""

import jax
import jax.numpy as jnp
import numpy as np

from diffnorm_tpu.models.stacked import (
    EOS,
    OFFSET,
    PAD,
    StackedEmbedding,
    pack_units,
    stack_unit_generate,
    unpack_units,
)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    v, n = 10, 3
    units = jnp.asarray(rng.integers(0, v, size=(4, 6, n)), jnp.int32)
    packed = pack_units(units, v, n)
    assert int(packed.min()) >= OFFSET
    sub = unpack_units(packed, v, n)
    np.testing.assert_array_equal(np.asarray(sub) - OFFSET, np.asarray(units))


def test_unpack_passes_specials_through():
    sub = unpack_units(jnp.asarray([PAD, EOS]), 10, 2)
    np.testing.assert_array_equal(np.asarray(sub), [[PAD, PAD], [EOS, EOS]])


def test_stacked_embedding_shapes():
    m = StackedEmbedding(num_embeddings=14, embed_dim=8, num_stacked=2)
    toks = jnp.asarray([[4, 5, 1]], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), toks)
    out = m.apply(variables, toks)
    assert out.shape == (1, 3, 8)
    m1 = StackedEmbedding(num_embeddings=14, embed_dim=8, num_stacked=1)
    v1 = m1.init(jax.random.PRNGKey(0), toks)
    assert m1.apply(v1, toks).shape == (1, 3, 8)


def test_stack_unit_generate():
    v, n, b = 6, 2, 3

    def decode_step(prev, pos):
        # deterministic toy: emit unit (pos mod v) in both sub-frames,
        # eos at step 4
        logits = jnp.full((b, n, v + 4), -10.0)
        unit = (pos[0] % v) + OFFSET
        logits = logits.at[:, :, unit].set(0.0)
        logits = jnp.where(pos[0] == 4, logits.at[:, :, EOS].set(5.0), logits)
        return logits

    packed, sub = stack_unit_generate(decode_step, b, v, n, max_len=8)
    packed = np.asarray(packed)
    sub = np.asarray(sub)
    assert packed.shape == (b, 8)
    assert sub.shape == (b, 8, n)
    # first 4 steps emit packed units, then pad after eos
    assert (packed[:, :4] >= OFFSET).all()
    assert (packed[:, 4:] == PAD).all()
    # packed value decodes back to the sub units
    np.testing.assert_array_equal(
        np.asarray(unpack_units(jnp.asarray(packed[:, :4]), v, n)),
        sub[:, :4],
    )
