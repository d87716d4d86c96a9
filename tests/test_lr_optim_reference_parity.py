"""LR-scheduler and optimizer parity vs the REAL reference implementations.

The step/triangular/manual/reduce_lr_on_plateau schedulers and the
adamax/nag optimizers are exec'd VERBATIM from /root/reference
(tests/reference_loader.py); adadelta is pinned against torch.optim.Adadelta
(which the reference's fairseq/optim/adadelta.py delegates to). Host-driven
scheduling (manual/plateau) is additionally exercised through the real
Trainer to pin the unit-lr + traced-lr_value apply-step plumbing.
"""

import types

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
import torch

from diffnorm_tpu.config import Config, make_trainer_config
from diffnorm_tpu.registry import TASKS
from diffnorm_tpu.train.lr_schedules import build_lr_schedule
from diffnorm_tpu.train.optimizers import OPTIMIZERS, build_optimizer

import reference_loader as ref


class _FakeOptim:
    """Minimal FairseqOptimizer surface the reference schedulers drive;
    optionally wraps a real torch optimizer (reduce_lr_on_plateau mutates
    its param_groups through torch's ReduceLROnPlateau)."""

    def __init__(self, torch_opt=None):
        self.optimizer = torch_opt
        self._lr = 0.0

    def set_lr(self, lr):
        self._lr = lr
        if self.optimizer is not None:
            for g in self.optimizer.param_groups:
                g["lr"] = lr

    def get_lr(self):
        if self.optimizer is not None:
            return self.optimizer.param_groups[0]["lr"]
        return self._lr


# --------------------------------------------------------------- schedules


def test_step_lr_matches_reference():
    scheds = ref.load_ref_lr_schedulers()
    cfg = types.SimpleNamespace(
        warmup_updates=50, warmup_init_lr=-1, lr=[1e-3], min_lr=1e-5,
        lr_deacy_period=40, lr_decay=0.5)
    r = scheds.StepLRSchedule(cfg, _FakeOptim())
    ours = build_lr_schedule(Config(
        lr_scheduler="step", lr=1e-3, warmup_updates=50, min_lr=1e-5,
        lr_deacy_period=40, lr_decay=0.5))
    for k in list(range(0, 120)) + [500, 5000, 50000]:
        np.testing.assert_allclose(
            float(ours(k)), r.step_update(k), rtol=1e-6,
            err_msg=f"num_updates={k}")


def test_triangular_matches_reference():
    scheds = ref.load_ref_lr_schedulers()
    for shrink_min in (False, True):
        cfg = types.SimpleNamespace(
            max_lr=1e-3, lr_period_updates=100.0, lr_shrink=0.5,
            shrink_min=shrink_min, lr=[1e-4])
        r = scheds.TriangularLRSchedule(cfg, _FakeOptim())
        ours = build_lr_schedule(Config(
            lr_scheduler="triangular", lr=1e-4, max_lr=1e-3,
            lr_period_updates=100, lr_shrink=0.5, shrink_min=shrink_min))
        for k in range(0, 450, 7):
            np.testing.assert_allclose(
                float(ours(k)), r.step_update(k), rtol=1e-6,
                err_msg=f"num_updates={k} shrink_min={shrink_min}")


def test_manual_matches_reference():
    scheds = ref.load_ref_lr_schedulers()
    epoch2lr = "{'1,2': 0.01, '3-5': 0.005, '7': 0.001}"
    update2lr = "{'10': 0.02, '25-30': 0.004}"
    args = types.SimpleNamespace(epoch2lr=epoch2lr, update2lr=update2lr,
                                 lr=[0.05])
    r = scheds.ManualSchedule(args, _FakeOptim())
    ours = build_lr_schedule(Config(
        lr_scheduler="manual", lr=0.05, epoch2lr=epoch2lr,
        update2lr=update2lr))
    assert ours.host_driven
    num_updates = 0
    for epoch in range(1, 9):
        np.testing.assert_allclose(
            ours.step_begin_epoch(epoch), r.step_begin_epoch(epoch),
            err_msg=f"epoch={epoch}")
        for _ in range(6):
            num_updates += 1
            np.testing.assert_allclose(
                ours.step_update(num_updates), r.step_update(num_updates),
                err_msg=f"update={num_updates}")


def test_reduce_lr_on_plateau_matches_reference():
    scheds = ref.load_ref_lr_schedulers()
    p = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.SGD([p], lr=1.0)
    cfg = types.SimpleNamespace(
        lr_shrink=0.5, lr_threshold=1e-4, lr_patience=1, warmup_updates=10,
        warmup_init_lr=-1, lr=[1e-3], maximize_best_checkpoint_metric=False)
    r = scheds.ReduceLROnPlateauLRSchedule(cfg, _FakeOptim(topt))
    ours = build_lr_schedule(Config(
        lr_scheduler="reduce_lr_on_plateau", lr=1e-3, lr_shrink=0.5,
        lr_threshold=1e-4, lr_patience=1, warmup_updates=10))
    assert ours.host_driven
    # warmup phase, indexed by update count
    for k in range(1, 15):
        np.testing.assert_allclose(
            ours.step_update(k), r.step_update(k), rtol=1e-6,
            err_msg=f"warmup update={k}")
    # epoch ends: improvement, plateau x3 (patience 1 -> shrink on the 2nd
    # bad epoch), improvement under threshold (rel mode), deep plateau
    losses = [5.0, 5.0, 5.0, 5.0, 4.99995, 4.9, 4.9, 4.9, 4.9, 4.9]
    for epoch, loss in enumerate(losses, start=1):
        r.step(epoch, loss)
        ours.step_epoch(epoch, loss)
        np.testing.assert_allclose(
            ours.lr, r.optimizer.get_lr(), rtol=1e-6,
            err_msg=f"epoch={epoch} loss={loss}")
    # state round trip preserves plateau memory
    sd = ours.state_dict()
    ours2 = build_lr_schedule(Config(
        lr_scheduler="reduce_lr_on_plateau", lr=1e-3, lr_shrink=0.5,
        lr_threshold=1e-4, lr_patience=1, warmup_updates=10))
    ours2.load_state_dict(sd)
    assert ours2.lr == ours.lr and ours2.best == ours.best


# --------------------------------------------------------------- optimizers


def _trajectory_ours(name, cfg, params0, grads_seq, lr):
    cfg = Config(optimizer=name, lr=lr, lr_scheduler="fixed", **cfg)
    tx = build_optimizer(cfg, build_lr_schedule(cfg))
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(params)
    for g in grads_seq:
        g = {k: jnp.asarray(v) for k, v in g.items()}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    return {k: np.asarray(v) for k, v in params.items()}


def _trajectory_torch(opt_factory, params0, grads_seq):
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params0.items()}
    opt = opt_factory(list(tparams.values()))
    for g in grads_seq:
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k])
        opt.step()
    return {k: p.detach().numpy() for k, p in tparams.items()}


def _rand_problem(seed=0, steps=8):
    rng = np.random.default_rng(seed)
    params0 = {"w": rng.normal(size=(4, 3)).astype(np.float32),
               "b": rng.normal(size=(3,)).astype(np.float32)}
    grads_seq = [
        {k: rng.normal(size=v.shape).astype(np.float32)
         for k, v in params0.items()}
        for _ in range(steps)
    ]
    return params0, grads_seq


def test_adamax_trajectory_matches_reference():
    m = ref.load_fairseq_adamax()
    params0, grads_seq = _rand_problem(1)
    for wd, bias_correction in ((0.0, True), (0.01, True), (0.01, False)):
        ours = _trajectory_ours(
            "adamax",
            dict(adamax_betas="(0.9,0.999)", adamax_eps=1e-8,
                 weight_decay=wd, no_bias_correction=not bias_correction),
            params0, grads_seq, lr=1e-2)
        theirs = _trajectory_torch(
            lambda ps: m.Adamax(ps, lr=1e-2, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=wd,
                                bias_correction=bias_correction),
            params0, grads_seq)
        for k in params0:
            np.testing.assert_allclose(ours[k], theirs[k], rtol=2e-5,
                                       atol=1e-7, err_msg=f"wd={wd} {k}")


def test_adadelta_trajectory_matches_torch():
    # reference fairseq/optim/adadelta.py:15 delegates to torch.optim.Adadelta
    params0, grads_seq = _rand_problem(2)
    for wd in (0.0, 0.01):
        ours = _trajectory_ours(
            "adadelta", dict(adadelta_rho=0.9, adadelta_eps=1e-6,
                             weight_decay=wd),
            params0, grads_seq, lr=0.5)
        theirs = _trajectory_torch(
            lambda ps: torch.optim.Adadelta(ps, lr=0.5, rho=0.9, eps=1e-6,
                                            weight_decay=wd),
            params0, grads_seq)
        for k in params0:
            np.testing.assert_allclose(ours[k], theirs[k], rtol=2e-5,
                                       atol=1e-7, err_msg=f"wd={wd} {k}")


def test_nag_trajectory_matches_reference_with_changing_lr():
    m = ref.load_fairseq_nag()
    params0, grads_seq = _rand_problem(3, steps=10)
    lrs = [0.1, 0.1, 0.08, 0.08, 0.05, 0.05, 0.2, 0.2, 0.01, 0.01]

    # ours: the schedule is consumed inside the transform (count-indexed)
    cfg = Config(optimizer="nag", momentum=0.9, weight_decay=0.01)
    lr_table = jnp.asarray(lrs, jnp.float32)
    tx = OPTIMIZERS.get("nag")(cfg, lambda step: lr_table[step])
    params = {k: jnp.asarray(v) for k, v in params0.items()}
    state = tx.init(params)
    for g in grads_seq:
        g = {k: jnp.asarray(v) for k, v in g.items()}
        updates, state = tx.update(g, state, params)
        params = optax.apply_updates(params, updates)
    ours = {k: np.asarray(v) for k, v in params.items()}

    # theirs: the scheduler sets param_groups lr before every step
    tparams = {k: torch.nn.Parameter(torch.tensor(v)) for k, v in params0.items()}
    opt = m.NAG(list(tparams.values()), lr=lrs[0], momentum=0.9,
                weight_decay=0.01)
    for lr, g in zip(lrs, grads_seq):
        opt.param_groups[0]["lr"] = lr
        for k, p in tparams.items():
            p.grad = torch.tensor(g[k])
        opt.step()
    theirs = {k: p.detach().numpy() for k, p in tparams.items()}
    for k in params0:
        np.testing.assert_allclose(ours[k], theirs[k], rtol=2e-5, atol=1e-7,
                                   err_msg=k)


def test_lamb_builds_and_descends():
    # reference fused_lamb.py delegates to apex (CUDA-only, not loadable);
    # capability parity: the optax LAMB must build through the registry and
    # reduce a convex loss
    params = {"w": jnp.ones((8,)) * 3.0}
    cfg = Config(optimizer="lamb", lr=0.1, lr_scheduler="fixed",
                 lamb_betas="(0.9,0.999)", weight_decay=0.0)
    tx = build_optimizer(cfg, build_lr_schedule(cfg))
    state = tx.init(params)
    for _ in range(20):
        grads = {"w": 2 * params["w"]}  # d/dw ||w||^2
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert float(jnp.linalg.norm(params["w"])) < 3.0 * np.sqrt(8) * 0.5


def test_nag_rejects_host_driven_schedule():
    cfg = Config(optimizer="nag", lr=1e-3, lr_scheduler="manual",
                 update2lr="{'1': 0.01}")
    with pytest.raises(ValueError, match="nag"):
        build_optimizer(cfg, build_lr_schedule(cfg))


def test_pass_through_adafactor_and_composite_groups():
    # adafactor owns its schedule under --lr-scheduler pass_through
    cfg = Config(optimizer="adafactor", lr_scheduler="pass_through")
    tx = build_optimizer(cfg, build_lr_schedule(cfg))
    params = {"w": jnp.ones((4, 4))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((4, 4))}, state, params)
    assert np.isfinite(np.asarray(updates["w"])).all()
    assert not np.allclose(np.asarray(updates["w"]), 0.0)

    # composite groups carrying their own optimizer + scheduler
    cfg = Config(
        optimizer="composite", lr=1e-3, lr_scheduler="fixed",
        composite_default="adam",
        composite_groups={
            "enc": {"optimizer": "sgd", "lr_scheduler": "fixed", "lr": 1.0},
        },
    )
    tx = build_optimizer(cfg, build_lr_schedule(cfg))
    params = {"enc": {"w": jnp.ones((2,))}, "dec": {"w": jnp.ones((2,))}}
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    # sgd at lr 1.0 moves by exactly -1; adam at 1e-3 moves by ~1e-3
    np.testing.assert_allclose(np.asarray(updates["enc"]["w"]), -1.0,
                               rtol=1e-5)
    assert abs(float(updates["dec"]["w"][0])) < 2e-3


# ----------------------------------------------------- trainer integration


def _tiny_trainer(**cfg_extra):
    cfg = Config(
        arch="speech_vae_decoder", criterion="speech_vae_decoder_loss",
        feature_dim=24, latent_dim=3, chan_mults=[4], vae_decoder_depth=1,
        vae_decoder_dim_head=8, vae_decoder_heads=2, target_code_size=16,
        **cfg_extra,
    )
    from diffnorm_tpu.train.trainer import Trainer

    task = TASKS.get("dummy_vae").setup_task(cfg)
    trainer = Trainer(make_trainer_config(cfg), task, task.build_model(),
                      task.build_criterion())
    return trainer, task


def test_trainer_host_driven_plateau_lr():
    trainer, task = _tiny_trainer(
        lr=1e-3, lr_scheduler="reduce_lr_on_plateau", lr_shrink=0.5,
        lr_patience=0)
    batch = task.dummy_batch(2, 8)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    np.testing.assert_allclose(mets["lr"], 1e-3, rtol=1e-6)
    # epoch 1 sets best; epoch 2 plateaus -> lr halves, next update sees it
    trainer.lr_step_epoch(1, 5.0)
    trainer.lr_step_epoch(2, 5.0)
    state, mets = trainer.train_step(state, [batch], jax.random.PRNGKey(2))
    np.testing.assert_allclose(mets["lr"], 5e-4, rtol=1e-6)
    # scheduler state is exposed for the checkpoint sidecar
    assert trainer.lr_state_dict()["lr"] == pytest.approx(5e-4)


def test_trainer_host_driven_manual_lr():
    trainer, task = _tiny_trainer(
        lr=0.05, lr_scheduler="manual", update2lr="{'2': 0.01}")
    batch = task.dummy_batch(2, 8)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    state, m1 = trainer.train_step(state, [batch], jax.random.PRNGKey(1))
    state, m2 = trainer.train_step(state, [batch], jax.random.PRNGKey(2))
    state, m3 = trainer.train_step(state, [batch], jax.random.PRNGKey(3))
    np.testing.assert_allclose(m1["lr"], 0.05, rtol=1e-6)  # update 0
    np.testing.assert_allclose(m2["lr"], 0.05, rtol=1e-6)  # update 1 < 2
    np.testing.assert_allclose(m3["lr"], 0.01, rtol=1e-6)  # update 2


def test_bmuf_rejects_host_driven_schedule():
    cfg = Config(optimizer="adam", lr=1e-3, use_bmuf=True,
                 lr_scheduler="manual", update2lr="{'1': 0.01}")
    with pytest.raises(ValueError, match="BMUF"):
        build_optimizer(cfg, build_lr_schedule(cfg))
