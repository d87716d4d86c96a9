"""Optimizers: registry builds, BMUF state machine, EMA, ZeRO sharding,
monotonic alignment op."""

import ctypes

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from diffnorm_tpu.config import Config
from diffnorm_tpu.train.lr_schedules import build_lr_schedule
from diffnorm_tpu.train.optimizers import EMA, bmuf, build_optimizer


def test_all_optimizers_step():
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for name in ("adam", "adafactor", "adagrad", "sgd"):
        cfg = Config(optimizer=name, lr=1e-2, lr_scheduler="fixed")
        tx = build_optimizer(cfg, build_lr_schedule(cfg), clip_norm=1.0)
        state = tx.init(params)
        updates, state = tx.update(grads, state, params)
        new = optax.apply_updates(params, updates)
        assert np.isfinite(np.asarray(new["w"])).all(), name
        assert not np.allclose(np.asarray(new["w"]), np.asarray(params["w"])), name


def test_bmuf_sync_moves_global():
    base = optax.sgd(0.1)
    tx = bmuf(base, sync_freq=2, block_momentum=0.5)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    grads = {"w": jnp.ones((2,))}
    # step 1: no sync -> plain sgd step
    u1, state = tx.update(grads, state, params)
    p1 = optax.apply_updates(params, u1)
    np.testing.assert_allclose(np.asarray(p1["w"]), 0.9, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state["global"]["w"]), 1.0)
    # step 2: sync -> global moves toward params via block momentum
    u2, state = tx.update(grads, state, p1)
    p2 = optax.apply_updates(p1, u2)
    assert float(state["global"]["w"][0]) < 1.0
    assert np.isfinite(np.asarray(p2["w"])).all()


def test_ema_moves_toward_params():
    ema = EMA(0.9)
    e = ema.init({"w": jnp.zeros((2,))})
    e = ema.update(e, {"w": jnp.ones((2,))})
    np.testing.assert_allclose(np.asarray(e["w"]), 0.1, rtol=1e-6)


def test_zero_sharding_mesh():
    from diffnorm_tpu.parallel.mesh import make_mesh
    from diffnorm_tpu.train.optimizers import shard_optimizer_state

    mesh = make_mesh(data=4, model=2)
    tx = optax.adam(1e-3)
    params = {"w": jnp.ones((8, 16))}
    state = shard_optimizer_state(tx.init(params), mesh)
    # adam mu should now be sharded over "data" on its first axis
    mu = state[0].mu["w"]
    assert "data" in str(mu.sharding)


def test_monotonic_alignment():
    from diffnorm_tpu.data.batching import _load_native

    lib = _load_native()
    if not lib:
        pytest.skip("native lib not built")
    lib.best_monotonic_alignment.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long),
    ]
    # diagonal-dominant log-prob matrix -> near-diagonal path
    tx_, ty_ = 6, 3
    logp = np.full((tx_, ty_), -5.0, np.float32)
    for i in range(tx_):
        logp[i, min(i // 2, ty_ - 1)] = 0.0
    path = np.zeros(tx_, np.int64)
    lib.best_monotonic_alignment(
        logp.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tx_, ty_,
        path.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    assert (np.diff(path) >= 0).all()       # monotonic
    assert path[0] == 0 and path[-1] == ty_ - 1
    np.testing.assert_array_equal(path, [0, 0, 1, 1, 2, 2])


def test_adam_matches_reference_fairseq_adam():
    """Our adam (optax.adamw via build_optimizer) vs the VERBATIM reference
    fairseq/optim/adam.py Adam (AdamW-style decoupled weight decay — what
    every DiffNorm recipe trains with): identical params after 10 steps on
    shared grads, including a changing per-step lr and weight decay."""
    import numpy as np
    import jax.numpy as jnp
    import optax
    import torch

    from reference_loader import load_fairseq_adam
    from diffnorm_tpu.config import Config
    from diffnorm_tpu.train.optimizers import build_optimizer

    rng = np.random.default_rng(0)
    p0 = {"w": rng.normal(size=(7, 5)).astype(np.float64),
          "b": rng.normal(size=(5,)).astype(np.float64)}
    grads = [{k: rng.normal(size=v.shape).astype(np.float64)
              for k, v in p0.items()} for _ in range(10)]
    lrs = [5e-4 * (0.9 ** i) for i in range(10)]

    # ours: f64 on CPU so the comparison is numerics, not dtype
    with jax.enable_x64(True):
        cfg = Config(optimizer="adam", adam_betas="(0.9, 0.98)",
                     adam_eps=1e-8, weight_decay=0.01)
        tx = build_optimizer(cfg, lambda step: lrs[int(step)])
        params = {k: jnp.asarray(v) for k, v in p0.items()}
        state = tx.init(params)
        for g in grads:
            gj = {k: jnp.asarray(v) for k, v in g.items()}
            updates, state = tx.update(gj, state, params)
            params = optax.apply_updates(params, updates)

    # reference: verbatim fairseq Adam in torch f64
    ref_adam = load_fairseq_adam().Adam
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in p0.items()}
    opt = ref_adam(list(tparams.values()), lr=lrs[0], betas=(0.9, 0.98),
                   eps=1e-8, weight_decay=0.01)
    for i, g in enumerate(grads):
        for group in opt.param_groups:
            group["lr"] = lrs[i]
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k])
        opt.step()

    for k in p0:
        np.testing.assert_allclose(
            np.asarray(params[k]), tparams[k].detach().numpy(),
            rtol=1e-10, atol=1e-12)
