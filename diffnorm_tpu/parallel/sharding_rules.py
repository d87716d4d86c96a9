"""Tensor-parallel parameter sharding rules (Megatron-style, GSPMD-driven).

Replaces the reference's Megatron column/row-parallel layer classes
(fairseq/model_parallel/models/transformer.py, model_parallel/modules/) the
TPU way: parameters get NamedShardings over the "model" mesh axis by
path-based rules, jit/GSPMD propagates the layouts and inserts the
all-reduces. No parallel-layer classes — the same model code runs 1-way or
N-way TP depending only on the mesh.

Rules (for [in, out] Dense kernels):
* column-parallel (shard `out`): q/k/v projections, FFN up-projections,
  GEGLU in-projections
* row-parallel (shard `in`): attention output projections, FFN
  down-projections
* embeddings and everything else: replicated
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COLUMN_PARALLEL = (
    "to_q", "to_kv", "q_proj", "k_proj", "v_proj", "linear_q", "linear_k",
    "linear_v", "fc1", "w_1", "proj_in", "time_proj", "pointwise_conv1",
)
ROW_PARALLEL = (
    "to_out", "out_proj", "linear_out", "fc2", "w_2", "proj_out",
    "pointwise_conv2",
)


def param_spec(path: Tuple[str, ...], value) -> P:
    """PartitionSpec for one parameter by its tree path."""
    names = [p if isinstance(p, str) else getattr(p, "key", str(p)) for p in path]
    leaf = names[-1] if names else ""
    parent = names[-2] if len(names) > 1 else ""
    ndim = getattr(value, "ndim", 0)
    if leaf.startswith("experts_") and ndim >= 2:
        # expert parallelism: the leading expert axis shards over "model"
        # (BASE-layer MoE, models/moe.py)
        return P(*(["model"] + [None] * (ndim - 1)))
    if leaf == "kernel" and ndim >= 2:
        if parent in COLUMN_PARALLEL:
            return P(*([None] * (ndim - 1) + ["model"]))
        if parent in ROW_PARALLEL:
            # Dense kernels: [in, out]; conv kernels: [k, in, out]
            spec = [None] * ndim
            spec[-2] = "model"
            return P(*spec)
    if leaf == "bias" and parent in COLUMN_PARALLEL:
        return P("model")
    return P()


def fsdp_spec(spec: P, value, mesh: Mesh) -> P:
    """Add ZeRO-3/FSDP sharding: split the largest still-unsharded axis over
    "data" (reference FullyShardedDataParallel capability — GSPMD inserts
    the all-gathers on use and reduce-scatters on the gradients)."""
    dp = mesh.shape.get("data", 1)
    ndim = getattr(value, "ndim", 0)
    if dp == 1 or ndim == 0:
        return spec
    entries = list(spec) + [None] * (ndim - len(spec))
    axes = sorted(range(ndim), key=lambda a: -value.shape[a])
    for a in axes:
        if entries[a] is None and value.shape[a] % dp == 0 and value.shape[a] >= dp:
            entries[a] = "data"
            return P(*entries)
    return spec


def shard_params(params, mesh: Mesh, fsdp: bool = False):
    """device_put each param with its TP NamedSharding (replicated when the
    mesh has no real model axis); fsdp=True additionally shards every
    parameter over the "data" axis (ZeRO-3)."""

    def put(path, value):
        spec = param_spec(path, value) if mesh.shape.get("model", 1) > 1 else P()
        if fsdp:
            spec = fsdp_spec(spec, value, mesh)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(put, params)


def param_shardings(params, mesh: Mesh):
    """The NamedSharding tree (for jit in_shardings/out_shardings)."""
    if mesh.shape.get("model", 1) == 1:
        return jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), params)
    return jax.tree_util.tree_map_with_path(
        lambda path, v: NamedSharding(mesh, param_spec(path, v)), params
    )
