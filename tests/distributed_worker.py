"""Worker process for the real multi-process distributed test.

Spawned (2x) by tests/test_distributed_multiprocess.py with
DIFFNORM_MULTIHOST / DIFFNORM_COORDINATOR / DIFFNORM_NUM_PROCESSES /
DIFFNORM_PROCESS_ID set. Mirrors the reference's spawned process-group
tests (tests/distributed/utils.py:12-40: torch.multiprocessing.spawn +
file rendezvous) on the JAX runtime: jax.distributed.initialize connects
the processes, a ("data",) mesh spans BOTH processes' CPU devices, and one
jitted data-parallel train step makes XLA insert the cross-process psum
for the gradient reduction. Then a sharded checkpoint save -> restore ->
step through CheckpointManager proves multi-host checkpointing works.

Prints "DISTRIBUTED_OK step=<n> loss=<x>" on success; any assertion or
collective failure exits nonzero and fails the spawning test.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from diffnorm_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402
from diffnorm_tpu.train.checkpoint import CheckpointManager  # noqa: E402


def main(ckpt_dir: str) -> None:
    init_distributed()
    pid = jax.process_index()
    nproc = jax.process_count()
    assert nproc == int(os.environ["DIFFNORM_NUM_PROCESSES"]), nproc
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == nproc * n_local, (n_global, nproc, n_local)

    mesh = make_mesh(data=n_global, model=1)
    batch_shd = NamedSharding(mesh, P("data"))
    repl_shd = NamedSharding(mesh, P())

    # deterministic global data every process can reconstruct for the oracle
    d_in, d_out, per_dev = 8, 4, 2
    g = np.random.default_rng(0)
    w0 = g.normal(size=(d_in, d_out)).astype(np.float32)
    x_all = g.normal(size=(n_global * per_dev, d_in)).astype(np.float32)
    y_all = g.normal(size=(n_global * per_dev, d_out)).astype(np.float32)

    # each process contributes its local rows; the result is ONE global
    # array sharded over all processes' devices
    lo = pid * n_local * per_dev
    hi = lo + n_local * per_dev
    x = jax.make_array_from_process_local_data(batch_shd, x_all[lo:hi])
    y = jax.make_array_from_process_local_data(batch_shd, y_all[lo:hi])
    w = jax.make_array_from_process_local_data(repl_shd, w0)

    @jax.jit
    def train_step(w, x, y):
        def loss_fn(w):
            return jnp.mean(jnp.square(x @ w - y))

        loss, grad = jax.value_and_grad(loss_fn)(w)
        return loss, w - 0.1 * grad

    loss, w = train_step(w, x, y)
    loss = float(loss)

    # numpy oracle over the FULL batch: the distributed mean-grad psum must
    # reproduce the single-process math exactly
    def np_step(w):
        pred = x_all @ w
        l = float(np.mean((pred - y_all) ** 2))
        grad = 2.0 * x_all.T @ (pred - y_all) / (x_all.size // d_in * d_out)
        return l, w - 0.1 * grad

    l_ref, w_ref = np_step(w0)
    np.testing.assert_allclose(loss, l_ref, rtol=1e-5)

    # ---- sharded checkpoint save -> restore -> step (all processes) ------
    mgr = CheckpointManager(ckpt_dir, keep_last=1)
    # every leaf must be a GLOBAL array in multi-host mode (a host-local
    # SingleDeviceSharding scalar is not serializable by orbax)
    step_arr = jax.make_array_from_process_local_data(
        repl_shd, np.asarray(1, np.int32)
    )
    state = {"w": w, "step": step_arr}
    mgr.save(1, state, metric_value=loss, blocking=True)
    assert mgr.latest_step() == 1, mgr.latest_step()  # peers see the commit
    abstract = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=a.sharding),
        state,
    )
    restored, extra = mgr.load(1, target=abstract)
    assert extra["step"] == 1
    np.testing.assert_allclose(
        np.asarray(jax.device_get(restored["w"])), w_ref, rtol=1e-5, atol=1e-6
    )

    loss2, _ = train_step(restored["w"], x, y)
    l2_ref, _ = np_step(w_ref)
    np.testing.assert_allclose(float(loss2), l2_ref, rtol=1e-5)
    assert float(loss2) < loss  # it actually learned

    print(f"DISTRIBUTED_OK step=2 loss={float(loss2):.6f}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1])
