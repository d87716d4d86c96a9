"""Device mesh + sharding helpers.

Replaces the reference's torch.distributed/NCCL layer
(fairseq/distributed/utils.py:239-670, DDP wrappers, Megatron mpu) with the
JAX SPMD model: one `jax.sharding.Mesh` with axes ("data", "model"),
NamedShardings for batches (split on "data") and parameters (replicated, or
split on "model" for tensor parallelism), XLA inserting the collectives.
Multi-host initialization is `jax.distributed.initialize` — collectives ride
ICI within a slice and DCN across slices without any NCCL-style plumbing.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed():
    """Multi-host init (no-op single-host). Reference equivalent:
    distributed_utils.distributed_init (fairseq/distributed/utils.py:239).

    With only DIFFNORM_MULTIHOST=1 set, auto-detects the cluster (TPU pod
    metadata). DIFFNORM_COORDINATOR=host:port plus DIFFNORM_NUM_PROCESSES /
    DIFFNORM_PROCESS_ID pin an explicit rendezvous — the file-rendezvous
    equivalent of the reference's tests/distributed/utils.py:12-40, used by
    tests/test_distributed_multiprocess.py to run real 2-process training.
    """
    if not int(os.environ.get("DIFFNORM_MULTIHOST", "0")):
        return
    kwargs = {}
    coord = os.environ.get("DIFFNORM_COORDINATOR")
    if coord:
        kwargs = dict(
            coordinator_address=coord,
            num_processes=int(os.environ["DIFFNORM_NUM_PROCESSES"]),
            process_id=int(os.environ["DIFFNORM_PROCESS_ID"]),
        )
    jax.distributed.initialize(**kwargs)


def make_mesh(data: int = -1, model: int = 1, devices=None) -> Mesh:
    """Build a ("data", "model") mesh. data=-1 uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over "data"."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device_put a host batch with the leading axis split over "data".
    Scalars/0-d entries are replicated."""
    data_shard = batch_sharding(mesh)
    repl = replicated_sharding(mesh)

    def put(x):
        if not isinstance(x, jax.Array):
            # host array: np.asarray is free; device_put starts the upload
            x = np.asarray(x)
        # for device-resident arrays device_put with the target sharding is
        # a no-op when already placed correctly and an on-device reshard
        # otherwise (never a host round trip — np.asarray on a jax.Array
        # would pull D2H)
        if x.ndim == 0 or x.shape[0] % mesh.shape["data"] != 0:
            return jax.device_put(x, repl)
        return jax.device_put(x, NamedSharding(mesh, P(*(("data",) + (None,) * (x.ndim - 1)))))

    return jax.tree_util.tree_map(put, batch)


def prefetch_to_device(groups, mesh: Mesh, depth: int = 2):
    """Wrap an iterator of microbatch groups, starting each group's
    host->device transfer `depth` groups ahead.

    jax.device_put is asynchronous, so sharding group N+1 while step N
    computes overlaps the upload with device work. Measured on the remote
    TPU tunnel: the stage-2 diffusion train step is ~98 ms of device work
    but ~300 ms of synchronous batch upload — prefetch hides most of it.
    (Reference analog: fairseq's CUDA-stream batch prefetch in
    data/iterators.py + utils.move_to_cuda.)

    NOTE: train loops that checkpoint mid-epoch must record the TRAINED
    batch count via EpochBatchIterator.mark_trained — this wrapper pulls
    `depth` groups ahead, so the raw iterator position overcounts."""
    from diffnorm_tpu.data.iterators import read_ahead

    yield from read_ahead(
        groups, lambda g: [shard_batch(b, mesh) for b in g], depth=depth
    )


def replicate(tree, mesh: Mesh):
    repl = replicated_sharding(mesh)
    return jax.device_put(tree, repl)
