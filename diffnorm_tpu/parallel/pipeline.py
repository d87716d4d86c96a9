"""Pipeline parallelism: GPipe-style microbatch pipelining over a "stage"
mesh axis.

Capability parity with the reference's pipeline-model-parallel option
(fairseq --pipeline-model-parallel + model_parallel/models/
pipeline_parallel_transformer, torch Pipe) the TPU way: the layer stack
splits into S stages whose parameters live on different devices (a "stage"
mesh axis); activations flow stage-to-stage with `jax.lax.ppermute` inside a
`shard_map`, and M microbatches keep every stage busy after the fill phase
(S-1 bubble steps on each side, the standard GPipe schedule).

The reference's recipes never enable PP (the models are small); this module
exists so scale-out to deeper stacks does not need new communication code.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map


def pipeline_apply(
    stage_fn: Callable,
    stage_params,
    microbatches,
    mesh: Mesh,
    axis: str = "stage",
):
    """Run a pipelined forward.

    stage_fn(params_for_one_stage, x) -> x        (same shape in/out)
    stage_params: pytree with leading [S] axis (stage-sharded over `axis`)
    microbatches: [M, mb, ...] input microbatches (replicated)
    Returns [M, mb, ...] outputs after all S stages.

    Schedule: T = M + S - 1 ticks. At tick t, stage s processes microbatch
    t - s (when in range); activations ppermute one stage forward each tick.
    """
    s = mesh.shape[axis]
    m = microbatches.shape[0]
    ticks = m + s - 1

    def per_stage(params, mbs):
        # shard_map keeps the sharded leading axis at local size 1: strip it
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage_id = jax.lax.axis_index(axis)
        mb_shape = mbs.shape[1:]
        carry = jnp.zeros(mb_shape, mbs.dtype)  # activation arriving at me
        outs = jnp.zeros((m,) + mb_shape, mbs.dtype)
        # mark the carries device-varying over the stage axis (scan vma rule)
        carry = jax.lax.pcast(carry, (axis,), to="varying")
        outs = jax.lax.pcast(outs, (axis,), to="varying")

        def tick(state, t):
            carry, outs = state
            # stage 0 ingests microbatch t (if any); others use the carry
            x_in = jnp.where(
                stage_id == 0,
                mbs[jnp.clip(t, 0, m - 1)],
                carry,
            )
            active = (t - stage_id >= 0) & (t - stage_id < m)
            y = stage_fn(params, x_in)
            y = jnp.where(active, y, carry)
            # the last stage writes its finished microbatch
            done_mb = t - (s - 1)
            write = (stage_id == s - 1) & active
            updated = outs.at[jnp.clip(done_mb, 0, m - 1)].set(y)
            outs = jnp.where(write, updated, outs)
            # send activations forward one stage (ring; stage S-1 -> 0 unused)
            nxt = jax.lax.ppermute(
                y, axis, [(i, (i + 1) % s) for i in range(s)]
            )
            return (nxt, outs), ()

        (carry, outs), _ = jax.lax.scan(tick, (carry, outs), jnp.arange(ticks))
        # only the last stage holds real outputs; broadcast them to all
        outs = jax.lax.psum(
            jnp.where(stage_id == s - 1, outs, jnp.zeros_like(outs)), axis
        )
        return outs

    fn = shard_map(
        per_stage,
        mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=P(),
    )
    return fn(stage_params, microbatches)


def make_stage_mesh(num_stages: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= num_stages
    arr = np.asarray(devices[:num_stages])
    return Mesh(arr, axis_names=("stage",))
