"""Optimizer registry (reference: fairseq/optim/ — adam w/ fused path,
adafactor, adagrad, sgd, composite, fp16 wrappers, zero-sharding).

TPU redesign: optax transforms under jit; "fused" is what XLA does anyway.
fp16 dynamic loss scaling is unnecessary on TPU (bf16 has fp32-range
exponent), but a loss-scale wrapper is provided for capability parity.
ZeRO-2 optimizer-state sharding is a NamedSharding over the "data" axis
applied to the adam moments (see shard_optimizer_state), not a separate
optimizer class.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from diffnorm_tpu.registry import OPTIMIZERS, register_optimizer


def _betas(cfg):
    betas = cfg.get("adam_betas", (0.9, 0.98))
    if isinstance(betas, str):
        betas = tuple(float(x) for x in betas.strip("()[] ").split(","))
    return tuple(betas)


def scale_by_fairseq_adam(b1: float, b2: float, eps: float):
    """Adam moment scaling with the reference's exact eps placement
    (fairseq/optim/adam.py Adam.step): denom = sqrt(nu) + eps BEFORE the
    bias corrections, update = (sqrt(bc2)/bc1) * mu / denom. optax's
    scale_by_adam applies eps to the bias-CORRECTED sqrt(nu_hat) — an
    O(eps) trajectory difference; this transform is trajectory-exact
    (pinned vs the verbatim reference in tests/test_optim.py)."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * (g * g), state.nu, grads)
        count = state.count + 1
        t = count.astype(jnp.result_type(float))  # f64 under enable_x64
        scale = jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        updates = jax.tree_util.tree_map(
            lambda m, v: (scale * m / (jnp.sqrt(v) + eps)).astype(m.dtype),
            mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


@register_optimizer("adam")
def adam(cfg, lr_schedule):
    """fairseq adam = AdamW-style decoupled weight decay (lr-scaled,
    applied straight to the param) on top of the eps-before-correction
    moment update above (reference fairseq/optim/adam.py)."""
    b1, b2 = _betas(cfg)
    return optax.chain(
        scale_by_fairseq_adam(b1, b2, cfg.get("adam_eps", 1e-8)),
        optax.add_decayed_weights(cfg.get("weight_decay", 0.0)),
        optax.scale_by_learning_rate(lr_schedule),
    )


def scale_by_fairseq_adamax(b1: float, b2: float, eps: float,
                            bias_correction: bool = True):
    """Adamax moment scaling with the reference's exact semantics
    (fairseq/optim/adamax.py Adamax.step:107-172): exp_avg EMA, exp_inf
    infinity-norm max WITHOUT eps inside the max (torch's stock adamax adds
    eps to |g| before the max), eps added only in the denominator, and the
    bias correction dividing the step size."""

    def init(params):
        zeros = lambda p: jnp.zeros_like(p)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params),
        )

    def update(grads, state, params=None):
        del params
        mu = jax.tree_util.tree_map(
            lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads)
        nu = jax.tree_util.tree_map(
            lambda v, g: jnp.maximum(b2 * v, jnp.abs(g)), state.nu, grads)
        count = state.count + 1
        if bias_correction:
            bc = 1.0 - b1 ** count.astype(jnp.result_type(float))
        else:
            bc = 1.0
        updates = jax.tree_util.tree_map(
            lambda m, v: (m / ((v + eps) * bc)).astype(m.dtype), mu, nu)
        return updates, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


@register_optimizer("adamax")
def adamax(cfg, lr_schedule):
    """fairseq adamax (fairseq/optim/adamax.py): decoupled weight decay
    scaled by the RAW lr (not the bias-corrected step size) on top of the
    infinity-norm moment update above."""
    betas = cfg.get("adamax_betas", (0.9, 0.999))
    if isinstance(betas, str):
        betas = tuple(float(x) for x in betas.strip("()[] ").split(","))
    b1, b2 = betas
    return optax.chain(
        scale_by_fairseq_adamax(
            b1, b2, cfg.get("adamax_eps", 1e-8),
            bias_correction=not cfg.get("no_bias_correction", False)),
        optax.add_decayed_weights(cfg.get("weight_decay", 0.0)),
        optax.scale_by_learning_rate(lr_schedule),
    )


@register_optimizer("adadelta")
def adadelta(cfg, lr_schedule):
    """fairseq adadelta (fairseq/optim/adadelta.py delegates to
    torch.optim.Adadelta): L2 weight decay folded into the gradient BEFORE
    the accumulators (torch placement), rho/eps as torch."""
    chain = []
    wd = cfg.get("weight_decay", 0.0)
    if wd:
        chain.append(optax.add_decayed_weights(wd))  # L2-into-grad
    chain.append(optax.scale_by_adadelta(
        rho=cfg.get("adadelta_rho", 0.9), eps=cfg.get("adadelta_eps", 1e-6)))
    chain.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*chain)


@register_optimizer("lamb")
def lamb(cfg, lr_schedule):
    """--optimizer lamb (reference fairseq/optim/fused_lamb.py delegates to
    apex FusedLAMB, CUDA-only — capability parity via optax.lamb; the
    trust-ratio math is the published LAMB algorithm both implement)."""
    betas = cfg.get("lamb_betas", (0.9, 0.999))
    if isinstance(betas, str):
        betas = tuple(float(x) for x in betas.strip("()[] ").split(","))
    b1, b2 = betas
    return optax.lamb(
        learning_rate=lr_schedule, b1=b1, b2=b2,
        eps=cfg.get("lamb_eps", 1e-8),
        weight_decay=cfg.get("weight_decay", 0.0),
    )


@register_optimizer("nag")
def nag(cfg, lr_schedule):
    """fairseq NAG (fairseq/optim/nag.py NAG.step:62-108) — Nesterov
    momentum with the lr-correction term lr/lr_old rescaling the momentum
    buffer when the schedule changes the lr between steps:

        p   <- p*(1 - lr*wd) + buf * momentum^2 * (lr/lr_old)
                             - g * (1 + momentum) * lr
        buf <- buf * momentum * (lr/lr_old) - g * lr

    lr enters nonlinearly (inside the buffer), so this transform consumes
    the schedule itself rather than composing with scale_by_learning_rate."""
    momentum = float(cfg.get("momentum", 0.99))
    wd = float(cfg.get("weight_decay", 0.0))

    def init(params):
        return {
            "count": jnp.zeros([], jnp.int32),
            "buf": jax.tree_util.tree_map(jnp.zeros_like, params),
            "lr_old": jnp.asarray(lr_schedule(0), jnp.float32),
        }

    def update(grads, state, params=None):
        lr = jnp.asarray(lr_schedule(state["count"]), jnp.float32)
        lr_correct = jnp.where(state["lr_old"] > 0, lr / state["lr_old"], lr)
        updates = jax.tree_util.tree_map(
            lambda g, b, p: (-lr * wd * p + momentum ** 2 * lr_correct * b
                             - (1.0 + momentum) * lr * g).astype(p.dtype),
            grads, state["buf"], params)
        buf = jax.tree_util.tree_map(
            lambda b, g: momentum * lr_correct * b - lr * g,
            state["buf"], grads)
        return updates, {"count": state["count"] + 1, "buf": buf,
                         "lr_old": lr}

    return optax.GradientTransformation(init, update)


@register_optimizer("adafactor")
def adafactor(cfg, lr_schedule):
    return optax.adafactor(
        learning_rate=lr_schedule,
        decay_rate=cfg.get("decay_rate", 0.8),
        clipping_threshold=cfg.get("clip_threshold", 1.0),
        weight_decay_rate=cfg.get("weight_decay", 0.0) or None,
    )


@register_optimizer("adagrad")
def adagrad(cfg, lr_schedule):
    return optax.adagrad(
        learning_rate=lr_schedule,
        initial_accumulator_value=cfg.get("initial_accumulator_value", 0.0),
    )


@register_optimizer("sgd")
def sgd(cfg, lr_schedule):
    return optax.sgd(
        learning_rate=lr_schedule,
        momentum=cfg.get("momentum", 0.0) or None,
        nesterov=cfg.get("nesterov", False),
    )


@register_optimizer("composite")
def composite(cfg, lr_schedule):
    """Per-parameter-group optimizers (fairseq/optim/composite.py parity):
    cfg.composite_groups maps top-level param-tree keys to an optimizer name
    or to a dict of group overrides ({"optimizer": ..., "lr_scheduler": ...,
    "lr": ..., ...}) — the reference's groups each carry their own optimizer
    AND scheduler (paired with --lr-scheduler pass_through at the top)."""
    from diffnorm_tpu.train.lr_schedules import build_lr_schedule

    groups = cfg.get("composite_groups", {})
    default_name = cfg.get("composite_default", "adam")

    def build_group(spec):
        if isinstance(spec, str):
            return spec, OPTIMIZERS.get(spec)(cfg, lr_schedule)
        sub_cfg = dict(cfg)
        sub_cfg.update(spec)
        opt_name = spec.get("optimizer", default_name)
        if "lr_scheduler" in spec:
            sub_sched = build_lr_schedule(sub_cfg)
            if getattr(sub_sched, "host_driven", False):
                raise ValueError(
                    "composite groups cannot use host-driven lr schedulers "
                    "(manual / reduce_lr_on_plateau)")
        else:
            sub_sched = lr_schedule
        label = "::".join(f"{k}={spec[k]}" for k in sorted(spec)) or opt_name
        return label, OPTIMIZERS.get(opt_name)(sub_cfg, sub_sched)

    transforms = {default_name: OPTIMIZERS.get(default_name)(cfg, lr_schedule)}
    labels = {}
    for key, spec in groups.items():
        label, tx = build_group(spec)
        transforms[label] = tx
        labels[key] = label

    def label_fn(params):
        return {k: labels.get(k, default_name) for k in params}

    return optax.multi_transform(transforms, label_fn)


def freeze_finetune(inner, n_updates: int, keys):
    """fairseq --freeze-finetune-updates (hubert_asr.py:310-316): keep the
    listed top-level param subtrees EXACTLY unchanged for the first
    n_updates optimizer steps. Gradients into the subtree are zeroed before
    the inner optimizer (moments stay zero, clipping sees the gated grads)
    and the subtree's final updates are zeroed too (so weight decay can't
    leak). The gate is a traced comparison — crossing the threshold never
    retraces. (The reference also skips the frozen backward via no_grad;
    here the grads are computed then discarded — same math, simpler jit.)"""
    keys = tuple(keys)

    def gate(tree, live):
        return {k: (jax.tree_util.tree_map(
                    lambda x: x * live.astype(x.dtype), v)
                    if k in keys else v)
                for k, v in tree.items()}

    def init(params):
        return (jnp.zeros((), jnp.int32), inner.init(params))

    def update(grads, state, params=None):
        count, istate = state
        live = count >= n_updates
        grads = gate(grads, live)
        updates, istate = inner.update(grads, istate, params)
        updates = gate(updates, live)
        return updates, (count + 1, istate)

    return optax.GradientTransformation(init, update)


def build_optimizer(cfg, lr_schedule, clip_norm: float = 0.0):
    name = cfg.get("optimizer", "adam")
    if getattr(lr_schedule, "host_driven", False):
        # manual / reduce_lr_on_plateau: lr is a host-side value the trainer
        # threads into the jitted apply step as a traced scalar scaling the
        # final updates. Build the optimizer at unit lr — exact whenever lr
        # enters linearly at the end of the chain, which rules out nag
        # (lr/lr_old inside the momentum buffer).
        if name == "nag":
            raise ValueError(
                "nag's lr-corrected momentum needs the schedule inside the "
                "optimizer; host-driven lr schedulers (manual, "
                "reduce_lr_on_plateau) are not supported with --optimizer nag")
        if cfg.get("use_bmuf") or cfg.get("ddp_backend") == "slowmo":
            raise ValueError(
                "BMUF's sync-step snap-to-global delta is not lr-linear; "
                "host-driven lr schedulers (manual, reduce_lr_on_plateau) "
                "are not supported with --use-bmuf/slowmo")
        lr_schedule = lambda step: jnp.ones((), jnp.float32)  # noqa: E731
    elif getattr(lr_schedule, "pass_through", False):
        # --lr-scheduler pass_through: the optimizer owns the schedule
        # (reference pass_through.py). adafactor falls back to its internal
        # relative-step sizing; composite groups carry their own schedulers.
        if name == "adafactor":
            lr_schedule = None
        elif name != "composite":
            raise ValueError(
                "--lr-scheduler pass_through needs an optimizer with its own "
                "schedule (adafactor, or composite groups with per-group "
                "lr_scheduler)")
    tx = OPTIMIZERS.get(name)(cfg, lr_schedule)
    chain = []
    if clip_norm and clip_norm > 0:
        chain.append(optax.clip_by_global_norm(clip_norm))
    chain.append(tx)
    if cfg.get("loss_scale"):  # fp16-parity static loss scaling
        scale = float(cfg["loss_scale"])
        chain.insert(0, optax.scale(1.0 / scale))
    base = optax.chain(*chain)
    if cfg.get("use_bmuf") or cfg.get("ddp_backend") == "slowmo":
        base = bmuf(
            base,
            sync_freq=cfg.get("global_sync_iter", 50),
            block_momentum=cfg.get("block_momentum", 0.875),
            block_lr=cfg.get("block_lr", 1.0),
            use_nesterov=cfg.get("use_nbm", True),
        )
    n_freeze = int(cfg.get("freeze_finetune_updates", 0) or 0)
    if n_freeze > 0:
        base = freeze_finetune(
            base, n_freeze,
            cfg.get("freeze_finetune_subtrees", ("w2v_model",)))
    return base


# ----------------------------------------------------------- ZeRO-2 -------

def shard_optimizer_state(opt_state, mesh, params_shardings=None):
    """Shard big optimizer-state tensors (adam mu/nu etc.) over the "data"
    axis (reference --zero-sharding os, fairseq/optim/shard.py). Each moment
    splits on its first axis divisible by the data-parallel degree; GSPMD
    all-gathers on use. Scalars/small tensors stay replicated."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape.get("data", 1)
    if dp == 1:
        return opt_state

    def put(x):
        if not hasattr(x, "shape") or x.ndim == 0:
            return x
        for axis, size in enumerate(x.shape):
            if size % dp == 0 and size >= dp:
                spec = [None] * x.ndim
                spec[axis] = "data"
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map(put, opt_state)


# ----------------------------------------------------------- BMUF ---------

def bmuf(base_tx, sync_freq: int = 50, block_momentum: float = 0.875,
         block_lr: float = 1.0, use_nesterov: bool = True):
    """Block-momentum model update filtering (reference fairseq/optim/bmuf.py
    / --ddp-backend slowmo).

    Wraps a base optax transform; every `sync_freq` steps the accumulated
    block delta (params - last global snapshot) passes through a momentum
    filter and the parameters snap to the filtered global model. Under SPMD
    data-parallel the replicas are bit-identical so no collective is needed
    (the psum already happened on the gradients); the state machine matches
    the reference for multi-worker async setups.
    """

    def init(params):
        return {
            "base": base_tx.init(params),
            "step": jnp.zeros((), jnp.int32),
            "global": jax.tree_util.tree_map(jnp.copy, params),
            "smoothed": jax.tree_util.tree_map(jnp.zeros_like, params),
        }

    def update(grads, state, params=None):
        updates, new_base = base_tx.update(grads, state["base"], params)
        step = state["step"] + 1
        do_sync = (step % sync_freq) == 0

        prelim = optax.apply_updates(params, updates)

        def synced():
            grad_blk = jax.tree_util.tree_map(
                lambda g, p: g - p, state["global"], prelim
            )  # global - params (descent direction of the block)
            smoothed = jax.tree_util.tree_map(
                lambda m, g: block_momentum * m + block_lr
                * (1.0 - block_momentum) * (-g),
                state["smoothed"], grad_blk,
            )
            new_global = jax.tree_util.tree_map(
                lambda gl, m: gl + m, state["global"], smoothed
            )
            if use_nesterov:
                new_params = jax.tree_util.tree_map(
                    lambda gl, m: gl + block_momentum * m, new_global, smoothed
                )
            else:
                new_params = new_global
            return new_params, new_global, smoothed

        def not_synced():
            return prelim, state["global"], state["smoothed"]

        new_params, new_global, new_smoothed = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do_sync, a, b), synced(), not_synced()
        )
        # express the result as an additive update (optax contract)
        final_updates = jax.tree_util.tree_map(
            lambda np_, p: np_ - p, new_params, params
        )
        return final_updates, {
            "base": new_base, "step": step,
            "global": new_global, "smoothed": new_smoothed,
        }

    return optax.GradientTransformation(init, update)


# ----------------------------------------------------------- EMA ----------

class EMA:
    """Exponential moving average of parameters (reference fairseq/models/ema).

    Functional: `update` is jitted into the train step; `swap` returns the
    averaged params for eval/checkpointing.
    """

    def __init__(self, decay: float = 0.9999):
        self.decay = decay

    def init(self, params):
        # copy (not alias) so the EMA tree donates independently of params
        return jax.tree_util.tree_map(jnp.copy, params)

    def update(self, ema_params, new_params):
        d = self.decay
        return jax.tree_util.tree_map(
            lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
            ema_params, new_params,
        )
