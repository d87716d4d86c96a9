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
try:  # jax >= 0.8 top-level name; fall back for older jax
    from jax import shard_map
except ImportError:  # pragma: no cover
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
        # explicit zero at masked keys: exp(NEG - new_max) is 1, not 0, while
        # new_max is still NEG (a fully-masked first block would otherwise
        # pollute the accumulators)
        p = jnp.where(m_c[:, None, None, :], jnp.exp(sim - new_max), 0.0)
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


def ring_rel_pos_attention(q_u, q_v, k, v, pos, mask=None, axis: str = "seq"):
    """ESPNet rel-pos attention (Transformer-XL bias) over time-sharded
    q/k/v inside a shard_map — the sequence-parallel form of
    models/conformer.py RelPosSelfAttention.

    q_u: [B, H, Tl, d] queries + pos_bias_u (content term)
    q_v: [B, H, Tl, d] queries + pos_bias_v (position term)
    k/v: [B, H, Tl, d] local time-shards (global T = n·Tl)
    pos: [H, 2T-1, d] projected GLOBAL position table, replicated
         (row m <-> relative position T-1-m: positives first, descending)
    mask: optional [B, Tl] bool local key mask, True = valid
    Returns [B, H, Tl, d] matching the single-device scores
    (ac + rel_shift(bd)) / sqrt(d) softmax within f32 reassociation noise.
    """
    n = jax.lax.psum(1, axis)
    r = jax.lax.axis_index(axis)
    b, h, tl, d = k.shape
    t_global = (pos.shape[1] + 1) // 2
    scale = 1.0 / np.sqrt(d)
    q_u = q_u.astype(jnp.float32)
    q_v = q_v.astype(jnp.float32)
    if mask is None:
        mask = jnp.ones((b, tl), bool)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, s):
        k_c, v_c, m_c, run_max, run_sum, acc = carry
        # the k block on this device at step s originated on shard (r - s)
        k_shard = jnp.mod(r - s, n)
        d0 = (r - k_shard) * tl  # global query_start - key_start offset
        # slice the 2Tl-1 relative rows covering rel in [d0-Tl+1, d0+Tl-1]
        p_s = jax.lax.dynamic_slice(
            pos, (0, t_global - tl - d0, 0), (h, 2 * tl - 1, d)
        ).astype(jnp.float32)
        ac = jnp.einsum("bhtd,bhsd->bhts", q_u, k_c.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        bd = jnp.einsum("bhtd,hsd->bhts", q_v, p_s,
                        preferred_element_type=jnp.float32)
        sim = (ac + _rel_shift(bd)) * scale
        sim = jnp.where(m_c[:, None, None, :], sim, NEG)
        blk_max = jnp.max(sim, axis=-1, keepdims=True)
        new_max = jnp.maximum(run_max, blk_max)
        corr = jnp.exp(run_max - new_max)
        p = jnp.where(m_c[:, None, None, :], jnp.exp(sim - new_max), 0.0)
        new_sum = run_sum * corr + jnp.sum(p, axis=-1, keepdims=True)
        pv = jnp.einsum("bhqk,bhkd->bhqd", p, v_c.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        acc = acc * corr + pv
        k_c = jax.lax.ppermute(k_c, axis, perm)
        v_c = jax.lax.ppermute(v_c, axis, perm)
        m_c = jax.lax.ppermute(m_c, axis, perm)
        return (k_c, v_c, m_c, new_max, new_sum, acc), ()

    target_vma = set(getattr(jax.typeof(k), "vma", ())) | {axis}

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
    (_, _, _, _, run_sum, acc), _ = jax.lax.scan(
        step, init, jnp.arange(n))
    out = jnp.where(run_sum > 0.0, acc / jnp.maximum(run_sum, 1e-30), 0.0)
    return out.astype(k.dtype)


def _rel_shift(x):
    """[B, H, T, 2T-1] -> [B, H, T, T]: out[i, j] = x[i, j - i + T - 1]."""
    from diffnorm_tpu.models.conformer import rel_shift

    return rel_shift(x)


def halo_pad(x, left: int, right: int, axis: str = "seq"):
    """Exchange sequence-edge halos with ring neighbors: x [B, Tl, C] ->
    [B, left + Tl + right, C]. Devices at the global sequence boundary pad
    with zeros (matching the unsharded convolution's zero padding). Used to
    run temporal convolutions (e.g. the conformer depthwise conv) on
    time-sharded activations."""
    n = jax.lax.psum(1, axis)
    r = jax.lax.axis_index(axis)
    tl = x.shape[1]
    assert max(left, right) <= tl, (
        f"halo {max(left, right)} wider than the local shard {tl}: use fewer "
        "sequence shards (halo frames must come from the adjacent shard)"
    )
    parts = []
    if left > 0:
        # my trailing frames -> right neighbor's left halo
        fwd = [(i, (i + 1) % n) for i in range(n)]
        lh = jax.lax.ppermute(x[:, -left:, :], axis, fwd)
        lh = jnp.where(r == 0, jnp.zeros_like(lh), lh)
        parts.append(lh)
    parts.append(x)
    if right > 0:
        bwd = [(i, (i - 1) % n) for i in range(n)]
        rh = jax.lax.ppermute(x[:, :right, :], axis, bwd)
        rh = jnp.where(r == n - 1, jnp.zeros_like(rh), rh)
        parts.append(rh)
    return jnp.concatenate(parts, axis=1)


def conformer_encode_sp(encoder, variables, src, src_lengths, mesh,
                        axis: str = "seq", deterministic: bool = True):
    """Run a models/conformer.py ConformerEncoder with its layer stack
    sequence-parallel over `axis`: subsample/embed run replicated (4x
    downsample, cheap), then activations shard over time and every layer
    runs ring rel-pos attention + halo-exchanged depthwise conv. Output
    matches encoder.apply(variables, src, src_lengths) up to f32
    reassociation noise. Inference-path driver (deterministic)."""
    n = mesh.shape[axis]
    x, mask, pos_table = encoder.apply(
        variables, src, src_lengths, deterministic, method="embed")
    t = x.shape[1]
    pad_t = (-t) % n
    conv_keep = None
    if pad_t:
        from diffnorm_tpu.models.conformer import rel_positional_encoding

        x = jnp.pad(x, ((0, 0), (0, pad_t), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_t)))
        # re-derive the table at the padded length (values depend only on
        # (length, dim) — no device round trip)
        pos_table = jnp.asarray(
            rel_positional_encoding(t + pad_t, pos_table.shape[-1]),
            dtype=pos_table.dtype)
        # mark SP-introduced pad frames (beyond the true T') so the
        # depthwise conv zeroes them like the unsharded edge padding
        conv_keep = jnp.broadcast_to(
            jnp.arange(t + pad_t)[None, :] < t, mask.shape)
    fn = _sp_layers_fn(encoder, mesh, axis, deterministic,
                       conv_keep is not None)
    if conv_keep is None:
        out = fn(variables, x, pos_table, mask)
    else:
        out = fn(variables, x, pos_table, mask, conv_keep)
    if pad_t:
        out, mask = out[:, :t], mask[:, :t]
    return out, mask


_sp_fn_cache: dict = {}


def _sp_layers_fn(encoder, mesh: Mesh, axis: str, deterministic: bool,
                  with_keep: bool):
    """Cached jitted shard_map of the SP layer stack: jit caches by callable
    identity, so building a fresh closure per conformer_encode_sp call would
    recompile every batch (minutes through the TPU tunnel)."""
    key = (encoder, mesh, axis, deterministic, with_keep)
    fn = _sp_fn_cache.get(key)
    if fn is not None:
        return fn
    enc_sp = encoder.copy(sp_axis=axis)

    if with_keep:
        def body(variables, xs, pos_table, ms, ck):
            return enc_sp.apply(variables, xs, pos_table, ms, deterministic,
                                ck, method="run_layers")

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis, None), P(), P(None, axis),
                      P(None, axis)),
            out_specs=P(None, axis, None),
        )
    else:
        def body(variables, xs, pos_table, ms):
            return enc_sp.apply(variables, xs, pos_table, ms, deterministic,
                                method="run_layers")

        mapped = shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(None, axis, None), P(), P(None, axis)),
            out_specs=P(None, axis, None),
        )
    fn = jax.jit(mapped)
    _sp_fn_cache[key] = fn
    return fn


def make_seq_mesh(n: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n
    return Mesh(np.asarray(devices[:n]), axis_names=("seq",))
