"""Sequence parallelism: ring attention over a "seq" mesh axis.

The reference has no sequence/context parallelism (SURVEY.md §2e: longest
sources are 6000 fbank frames) — this module is the scale-out path beyond
what the reference supports: activations shard over time, each device holds
a [B, H, T/n, D] slice of q/k/v, and attention runs as n ring steps of an
online-softmax accumulation while K/V blocks rotate around the ring with
`jax.lax.ppermute` (compute of step i overlaps the permute for step i+1
under XLA's async collectives). Memory per device is O(T/n · T/n) score
tiles instead of O(T²), and the K/V traffic rides ICI.

Everything is differentiable (ppermute transposes to ppermute), so the same
op serves sequence-parallel *training* of long-context encoders.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

NEG = jnp.finfo(jnp.float32).min


def ring_attention(q, k, v, mask=None, axis: str = "seq"):
    """Attention over time-sharded q/k/v inside a shard_map.

    q/k/v: [B, H, Tl, D] local time-shards (global T = n·Tl)
    mask: optional [B, Tl] bool local shard, True = valid key position
    Returns [B, H, Tl, D] — the local shard of the full-attention output,
    numerically matching ops.attention.masked_attention (f32 softmax,
    bf16 probs@v when v is bf16).
    """
    n = jax.lax.psum(1, axis)
    scale = q.shape[-1] ** -0.5
    qf = q.astype(jnp.float32) * scale
    b, h, tl, d = q.shape
    if mask is None:
        mask = jnp.ones((b, tl), bool)

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        k_c, v_c, m_c, run_max, run_sum, acc = carry
        sim = jnp.einsum(
            "bhqd,bhkd->bhqk", qf, k_c.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        sim = jnp.where(m_c[:, None, None, :], sim, NEG)
        blk_max = jnp.max(sim, axis=-1, keepdims=True)
        new_max = jnp.maximum(run_max, blk_max)
        corr = jnp.exp(run_max - new_max)
        p = jnp.exp(sim - new_max)
        new_sum = run_sum * corr + jnp.sum(p, axis=-1, keepdims=True)
        if v_c.dtype == jnp.bfloat16:
            pv = jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(jnp.bfloat16), v_c,
                preferred_element_type=jnp.float32,
            )
        else:
            pv = jnp.einsum(
                "bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        acc = acc * corr + pv
        # rotate the K/V block one device forward; only the carry for the
        # next step depends on it, so XLA overlaps it with this step's MXU
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        m_c = jax.lax.ppermute(m_c, axis, perm)
        return (k_c, v_c, m_c, new_max, new_sum, acc), ()

    # mark every carry component device-varying over the same manual axes as
    # q (scan's varying-manual-axes rule: the step outputs inherit q's vma,
    # so the inits must match; under a nested ("data","seq") shard_map that
    # set is larger than just `axis`)
    target_vma = set(getattr(jax.typeof(q), "vma", ())) | {axis}

    def _varying(x):
        missing = tuple(target_vma - set(getattr(jax.typeof(x), "vma", ())))
        return jax.lax.pcast(x, missing, to="varying") if missing else x

    init = jax.tree_util.tree_map(
        _varying,
        (
            k, v, mask,
            jnp.full((b, h, tl, 1), NEG, jnp.float32),
            jnp.zeros((b, h, tl, 1), jnp.float32),
            jnp.zeros((b, h, tl, d), jnp.float32),
        ),
    )
    (_, _, _, _, run_sum, acc), _ = jax.lax.scan(step, init, None, length=n)
    # fully-masked query rows: denominator 0 -> emit 0 (downstream masks
    # padded positions anyway; the XLA path emits a uniform mix there)
    out = jnp.where(run_sum > 0.0, acc / jnp.maximum(run_sum, 1e-30), 0.0)
    return out.astype(q.dtype)


def sequence_parallel_attention(q, k, v, mask=None, mesh: Mesh = None,
                                axis: str = "seq"):
    """masked_attention computed with q/k/v time-sharded over `axis`.

    q/k/v: [B, H, T, D] global arrays (T divisible by the axis size);
    mask: optional [B, T]. Output matches
    ops.attention.masked_attention(q, k, v, mask) up to online-softmax
    reassociation (~1e-6 f32 / bf16 noise).
    """
    assert mesh is not None
    n = mesh.shape[axis]
    t = q.shape[-2]
    assert t % n == 0, f"seq len {t} not divisible by {axis}={n}"
    has_mask = mask is not None
    qkv_spec = P(None, None, axis, None)
    mask_spec = P(None, axis)

    if has_mask:
        fn = shard_map(
            partial(ring_attention, axis=axis),
            mesh=mesh,
            in_specs=(qkv_spec, qkv_spec, qkv_spec, mask_spec),
            out_specs=qkv_spec,
        )
        return fn(q, k, v, mask)
    fn = shard_map(
        partial(ring_attention, mask=None, axis=axis),
        mesh=mesh,
        in_specs=(qkv_spec, qkv_spec, qkv_spec),
        out_specs=qkv_spec,
    )
    return fn(q, k, v)


def make_seq_mesh(n: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n
    return Mesh(np.asarray(devices[:n]), axis_names=("seq",))
