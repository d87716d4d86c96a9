"""Workers for round-4 multi-process coverage (VERDICT r3 item 7):

mode=infer      — 2-process dp-sharded `ddim_sample` on a real tiny
                  latent-diffusion stack; process 0 prints the decoded
                  units, the spawning test compares them token-for-token
                  with a single-process run of the same model.
mode=trainckpt  — linear-model train step under the current topology,
                  sharded checkpoint save; prints the post-step loss.
mode=restore    — restore that checkpoint under a DIFFERENT topology
                  (more devices; replicated and FSDP param shardings) and
                  print the eval loss — must equal trainckpt's.

Reference equivalent: fairseq/distributed/utils.py:334-365 spawn semantics;
cross-topology restore is what checkpoint_utils.load_checkpoint does when
--distributed-world-size changes between runs.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")  # axon sitecustomize overrides env

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from diffnorm_tpu.parallel.mesh import init_distributed, make_mesh  # noqa: E402
from diffnorm_tpu.train.checkpoint import CheckpointManager  # noqa: E402


def build_tiny_diffusion():
    from diffnorm_tpu.config import Config
    from diffnorm_tpu.registry import TASKS, _import_all
    from diffnorm_tpu.tasks.dummy import DummyVAETask

    _import_all()
    cfg = Config(
        arch="diff_discrete", criterion="ddpm_discrete_loss",
        hidden_dim=16, latent_dim=3, feature_dim=24, chan_mults=[4],
        vae_decoder_depth=1, vae_decoder_dim_head=8, vae_decoder_heads=2,
        denoiser_depth=1, wavenet_layers=2, wavenet_stacks=1,
        timesteps=20, target_code_size=16,
    )
    task = TASKS.get("speech_diffusion_discrete").setup_task(cfg)
    model = task.build_model()
    batch = DummyVAETask(cfg).dummy_batch(2, 10)
    variables = task.init_variables(model, jax.random.PRNGKey(0), batch)
    return model, variables


def infer_batch():
    rng = np.random.default_rng(3)
    feat = rng.normal(size=(8, 10, 24)).astype(np.float32)
    mask = np.ones((8, 10), bool)
    mask[5, 7:] = False
    return feat, mask


def run_infer():
    from diffnorm_tpu.models.diffusion import ddim_sample

    init_distributed()
    n_global = jax.device_count()
    mesh = make_mesh(data=n_global, model=1)
    model, variables = build_tiny_diffusion()
    repl = NamedSharding(mesh, P())
    variables = jax.tree_util.tree_map(
        lambda a: jax.make_array_from_process_local_data(repl, np.asarray(a)),
        variables,
    )
    feat, mask = infer_batch()
    pid, n_local = jax.process_index(), jax.local_device_count()
    per = feat.shape[0] // jax.process_count()
    row_shd3 = NamedSharding(mesh, P("data", None, None))
    row_shd2 = NamedSharding(mesh, P("data", None))
    lo, hi = pid * per, (pid + 1) * per
    feat_g = jax.make_array_from_process_local_data(row_shd3, feat[lo:hi])
    mask_g = jax.make_array_from_process_local_data(row_shd2, mask[lo:hi])
    fn = jax.jit(lambda v, f, m, r: ddim_sample(model, v, f, m, r,
                                                start_step=6))
    units, _ = fn(variables, feat_g, mask_g, jax.random.PRNGKey(7))
    # replicate so every process can address the full result, then print
    units = jax.jit(lambda u: u, out_shardings=repl)(units)
    if jax.process_index() == 0:
        print("INFER_UNITS " + json.dumps(np.asarray(units).tolist()),
              flush=True)


def _linear_world():
    d_in, d_out, rows = 8, 4, 16
    g = np.random.default_rng(0)
    w0 = g.normal(size=(d_in, d_out)).astype(np.float32)
    x = g.normal(size=(rows, d_in)).astype(np.float32)
    y = g.normal(size=(rows, d_out)).astype(np.float32)
    return w0, x, y


def run_trainckpt(ckpt_dir):
    init_distributed()
    n_global = jax.device_count()
    mesh = make_mesh(data=n_global, model=1)
    repl = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("data"))
    w0, x_all, y_all = _linear_world()
    pid, n_local = jax.process_index(), jax.local_device_count()
    per = x_all.shape[0] // jax.process_count()
    lo, hi = pid * per, (pid + 1) * per
    x = jax.make_array_from_process_local_data(row, x_all[lo:hi])
    y = jax.make_array_from_process_local_data(row, y_all[lo:hi])
    w = jax.make_array_from_process_local_data(repl, w0)

    @jax.jit
    def step(w, x, y):
        loss, grad = jax.value_and_grad(
            lambda w: jnp.mean(jnp.square(x @ w - y)))(w)
        return loss, w - 0.1 * grad

    _, w1 = step(w, x, y)
    loss1 = float(jax.jit(
        lambda w: jnp.mean(jnp.square(x_all @ w - y_all)))(w1))
    mgr = CheckpointManager(ckpt_dir, keep_last=1)
    mgr.save(1, {"w": w1}, metric_value=loss1, blocking=True)
    if jax.process_index() == 0:
        print(f"CKPT_LOSS {loss1:.8f}", flush=True)


def run_restore(ckpt_dir):
    init_distributed()
    n_global = jax.device_count()
    mesh = make_mesh(data=n_global, model=1)
    w0, x_all, y_all = _linear_world()
    mgr = CheckpointManager(ckpt_dir, keep_last=1)
    eval_fn = jax.jit(lambda w: jnp.mean(jnp.square(x_all @ w - y_all)))
    losses = []
    for spec in (P(), P("data")):  # replicated + FSDP row-sharded restore
        shd = NamedSharding(mesh, spec)
        target = {"w": jax.ShapeDtypeStruct(w0.shape, np.float32,
                                            sharding=shd)}
        restored, _ = mgr.load(1, target=target)
        losses.append(float(eval_fn(restored["w"])))
    if jax.process_index() == 0:
        print(f"RESTORE_LOSS {losses[0]:.8f} {losses[1]:.8f}", flush=True)


if __name__ == "__main__":
    mode = sys.argv[1]
    if mode == "infer":
        run_infer()
    elif mode == "trainckpt":
        run_trainckpt(sys.argv[2])
    elif mode == "restore":
        run_restore(sys.argv[2])
    else:
        raise SystemExit(f"unknown mode {mode}")
