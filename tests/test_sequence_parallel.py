"""Sequence-parallel ring attention (parallel/sequence.py).

The reference has no sequence parallelism (SURVEY.md §2e); these tests pin
the scale-out addition: ring attention over a "seq" mesh axis must match the
single-device fused attention (forward AND gradients) including ragged
key-padding masks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffnorm_tpu.ops.attention import masked_attention
from diffnorm_tpu.parallel.sequence import (
    make_seq_mesh,
    sequence_parallel_attention,
)


def _inputs(b=2, h=3, t=32, d=8, dtype=jnp.float32, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, h, t, d)), dtype)
    k = jnp.asarray(rng.normal(size=(b, h, t, d)), dtype)
    v = jnp.asarray(rng.normal(size=(b, h, t, d)), dtype)
    lens = rng.integers(t // 2, t + 1, size=b)
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    return q, k, v, mask


def _needs8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


@pytest.mark.parametrize("n", [2, 4, 8])
def test_ring_matches_full_attention(n):
    _needs8()
    mesh = make_seq_mesh(n)
    q, k, v, mask = _inputs()
    ref = masked_attention(q, k, v, mask=mask)
    out = sequence_parallel_attention(q, k, v, mask=mask, mesh=mesh)
    # compare only valid query rows: at fully-masked queries the XLA path
    # emits a uniform value mix while the ring path emits 0 (both are
    # don't-care positions masked downstream)
    m = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-6
    )


def test_ring_no_mask():
    _needs8()
    mesh = make_seq_mesh(4)
    q, k, v, _ = _inputs(t=16)
    ref = masked_attention(q, k, v)
    out = sequence_parallel_attention(q, k, v, mesh=mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_ring_bf16_probs_at_v():
    _needs8()
    mesh = make_seq_mesh(4)
    q, k, v, mask = _inputs(dtype=jnp.bfloat16)
    ref = masked_attention(q, k, v, mask=mask)
    out = sequence_parallel_attention(q, k, v, mask=mask, mesh=mesh)
    m = np.asarray(mask)[:, None, :, None]
    err = np.abs(
        (np.asarray(out, np.float32) - np.asarray(ref, np.float32)) * m
    )
    assert err.max() < 3e-2, err.max()  # bf16 reassociation noise


def test_ring_gradients_match():
    """ppermute transposes to ppermute — sequence-parallel training grads
    must equal the single-device grads."""
    _needs8()
    mesh = make_seq_mesh(4)
    q, k, v, mask = _inputs(t=16)

    def loss_full(q, k, v):
        return jnp.sum(masked_attention(q, k, v, mask=mask) ** 2)

    def loss_ring(q, k, v):
        return jnp.sum(
            sequence_parallel_attention(q, k, v, mask=mask, mesh=mesh) ** 2
        )

    g_full = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_full, g_ring):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_ring_under_jit_with_data_axis():
    """Ring attention composes with a data axis: ("data", "seq") mesh,
    batch sharded over data, time over seq — the layout a long-context
    encoder train step would use."""
    _needs8()
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from functools import partial
    from jax.experimental.shard_map import shard_map

    from diffnorm_tpu.parallel.sequence import ring_attention

    devices = np.asarray(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "seq"))
    q, k, v, mask = _inputs(b=4, t=16)

    fn = shard_map(
        partial(ring_attention, axis="seq"),
        mesh=mesh,
        in_specs=(
            P("data", None, "seq", None),
            P("data", None, "seq", None),
            P("data", None, "seq", None),
            P("data", "seq"),
        ),
        out_specs=P("data", None, "seq", None),
    )
    out = jax.jit(fn)(q, k, v, mask)
    ref = masked_attention(q, k, v, mask=mask)
    m = np.asarray(mask)[:, None, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=2e-6
    )


def test_conformer_encoder_sp_matches_unsharded():
    """Full sequence-parallel conformer encode (ring rel-pos attention +
    halo-exchanged depthwise conv) matches the unsharded encoder."""
    _needs8()
    from diffnorm_tpu.models.conformer import ConformerEncoder
    from diffnorm_tpu.parallel.sequence import conformer_encode_sp

    enc = ConformerEncoder(dim=16, ffn_dim=32, layers=2, heads=4,
                           dropout=0.0, depthwise_kernel_size=7,
                           conv_channels=16)
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(2, 64, 80)), jnp.float32)
    lens = jnp.asarray([64, 41])
    v = enc.init(jax.random.PRNGKey(0), src, lens)

    ref, ref_mask = enc.apply(v, src, lens)

    mesh = make_seq_mesh(4)
    out, mask = conformer_encode_sp(enc, v, src, lens, mesh)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(ref_mask))
    m = np.asarray(ref_mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=5e-5
    )


def test_conformer_encoder_sp_ragged_pad():
    """T' not divisible by the seq axis: the driver pads and crops."""
    _needs8()
    from diffnorm_tpu.models.conformer import ConformerEncoder
    from diffnorm_tpu.parallel.sequence import conformer_encode_sp

    enc = ConformerEncoder(dim=16, ffn_dim=32, layers=1, heads=2,
                           dropout=0.0, depthwise_kernel_size=3,
                           conv_channels=16)
    rng = np.random.default_rng(1)
    src = jnp.asarray(rng.normal(size=(2, 44, 80)), jnp.float32)  # T'=11
    lens = jnp.asarray([44, 30])
    v = enc.init(jax.random.PRNGKey(0), src, lens)
    ref, ref_mask = enc.apply(v, src, lens)

    mesh = make_seq_mesh(4)  # 11 % 4 != 0 -> pad to 12
    out, mask = conformer_encode_sp(enc, v, src, lens, mesh)
    assert out.shape == ref.shape
    m = np.asarray(ref_mask)[:, :, None]
    np.testing.assert_allclose(
        np.asarray(out) * m, np.asarray(ref) * m, atol=5e-5
    )


def test_conformer_encoder_sp_gradients():
    """The SP layer stack is differentiable (ring attention + halo
    ppermutes transpose cleanly): grads through conformer_encode_sp match
    the unsharded encoder's grads (batch stats frozen — eval-mode norm)."""
    _needs8()
    from diffnorm_tpu.models.conformer import ConformerEncoder
    from diffnorm_tpu.parallel.sequence import conformer_encode_sp

    enc = ConformerEncoder(dim=16, ffn_dim=32, layers=1, heads=2,
                           dropout=0.0, depthwise_kernel_size=3,
                           conv_channels=16)
    rng = np.random.default_rng(2)
    src = jnp.asarray(rng.normal(size=(2, 32, 80)), jnp.float32)
    lens = jnp.asarray([32, 21])
    v = enc.init(jax.random.PRNGKey(0), src, lens)
    mesh = make_seq_mesh(4)

    def loss_full(params):
        out, mask = enc.apply({**v, "params": params}, src, lens)
        return jnp.sum((out * mask[:, :, None]) ** 2)

    def loss_sp(params):
        out, mask = conformer_encode_sp(
            enc, {**v, "params": params}, src, lens, mesh)
        return jnp.sum((out * mask[:, :, None]) ** 2)

    g_full = jax.grad(loss_full)(v["params"])
    g_sp = jax.grad(loss_sp)(v["params"])
    flat_f, _ = jax.flatten_util.ravel_pytree(g_full)
    flat_s, _ = jax.flatten_util.ravel_pytree(g_sp)
    np.testing.assert_allclose(np.asarray(flat_s), np.asarray(flat_f),
                               atol=5e-4)
