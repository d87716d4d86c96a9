"""Learning-rate schedules as optax-compatible callables.

`inverse_sqrt` is the one every DiffNorm recipe uses
(reference: fairseq/optim/lr_scheduler/inverse_square_root_schedule.py —
linear warmup from warmup_init_lr to lr over warmup_updates, then
lr * sqrt(warmup_updates / step)); the others cover the reference's
lr_scheduler registry capability.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from diffnorm_tpu.registry import register_lr_schedule


@register_lr_schedule("inverse_sqrt")
def inverse_sqrt(cfg):
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_updates", 4000))
    init_lr = float(cfg.get("warmup_init_lr", 1e-7))
    decay_factor = lr * warmup ** 0.5
    lr_step = (lr - init_lr) / warmup

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = init_lr + lr_step * step
        decay = decay_factor / jnp.sqrt(jnp.maximum(step, 1.0))
        return jnp.where(step < warmup, warm, decay)

    return schedule


@register_lr_schedule("fixed")
def fixed(cfg):
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_updates", 0))
    init_lr = float(cfg.get("warmup_init_lr", lr))
    if warmup <= 0:
        return optax.constant_schedule(lr)
    return optax.linear_schedule(init_lr, lr, warmup)


@register_lr_schedule("cosine")
def cosine(cfg):
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_updates", 0))
    init_lr = float(cfg.get("warmup_init_lr", 1e-7))
    total = int(cfg.get("max_updates", 100000))
    min_lr = float(cfg.get("min_lr", 1e-9))
    return optax.warmup_cosine_decay_schedule(
        init_value=init_lr,
        peak_value=lr,
        warmup_steps=max(warmup, 1),
        decay_steps=max(total, warmup + 1),
        end_value=min_lr,
    )


@register_lr_schedule("polynomial_decay")
def polynomial_decay(cfg):
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_updates", 0))
    total = int(cfg.get("max_updates", 100000))
    end_lr = float(cfg.get("end_learning_rate", 0.0))
    power = float(cfg.get("power", 1.0))
    schedules = []
    boundaries = []
    if warmup > 0:
        schedules.append(optax.linear_schedule(0.0, lr, warmup))
        boundaries.append(warmup)
    schedules.append(
        optax.polynomial_schedule(lr, end_lr, power, max(total - warmup, 1))
    )
    if len(schedules) == 1:
        return schedules[0]
    return optax.join_schedules(schedules, boundaries)


@register_lr_schedule("step")
def step_lr(cfg):
    """Decay lr by a fixed factor every k updates
    (reference fairseq/optim/lr_scheduler/step_lr_scheduler.py:37-86):
    linear warmup from warmup_init_lr (default min_lr) to lr over
    warmup_updates, then lr * lr_decay^((step-warmup)//period), floored at
    min_lr. The reference flag is literally --lr-deacy-period (upstream
    typo); the corrected spelling is accepted too."""
    max_lr = float(cfg.get("lr", 5e-4))
    min_lr = float(cfg.get("min_lr", 0.0))
    period = int(cfg.get("lr_deacy_period", cfg.get("lr_decay_period", 25000)))
    decay = float(cfg.get("lr_decay", 0.5))
    warmup = int(cfg.get("warmup_updates", 0))
    init_lr = float(cfg.get("warmup_init_lr", -1))
    if init_lr < 0:
        init_lr = min_lr
    assert period > 0 and decay <= 1 and min_lr >= 0 and max_lr > min_lr
    warmup_step = (max_lr - init_lr) / warmup if warmup > 0 else 1.0

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = init_lr + warmup_step * step
        cur = jnp.maximum(step - warmup, 0.0)
        mult = jnp.power(decay, jnp.floor(cur / period))
        decayed = jnp.maximum(max_lr * mult, min_lr)
        return jnp.where(step < warmup, warm, decayed)

    return schedule


@register_lr_schedule("triangular")
def triangular(cfg):
    """Cyclical triangular schedule (reference
    fairseq/optim/lr_scheduler/triangular_lr_scheduler.py:35-85;
    arXiv 1506.01186): oscillate between lr (the min) and max_lr with
    period lr_period_updates, shrinking the peak by lr_shrink each cycle
    (and the floor too when shrink_min is set)."""
    min_lr = float(cfg.get("lr", 5e-4))
    max_lr = float(cfg.get("max_lr", min_lr * 10))
    assert max_lr > min_lr, "max_lr must be more than lr"
    stepsize = int(float(cfg.get("lr_period_updates", 5000))) // 2
    shrink = float(cfg.get("lr_shrink", 0.1))
    shrink_min = bool(cfg.get("shrink_min", False))

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        cycle = jnp.floor(step / (2 * stepsize))
        sh = jnp.power(shrink, cycle)
        mx = max_lr * sh
        mn = min_lr * sh if shrink_min else min_lr
        x = jnp.abs(step / stepsize - 2 * (cycle + 1) + 1)
        return mn + (mx - mn) * jnp.maximum(0.0, 1.0 - x)

    return schedule


@register_lr_schedule("pass_through")
def pass_through(cfg):
    """Delegate lr scheduling to the optimizer (reference
    fairseq/optim/lr_scheduler/pass_through.py). Pairs with optimizers that
    own a schedule: adafactor's relative-step sizing, or composite groups
    carrying their own per-group lr_scheduler (build_optimizer consumes the
    marker)."""

    def schedule(step):
        return jnp.zeros((), jnp.float32)  # logged lr; optimizer owns the real one

    schedule.pass_through = True
    return schedule


class HostDrivenSchedule:
    """Base for schedules whose lr depends on host-side events (validation
    metrics, manual epoch tables) rather than only the update counter.

    The trainer never calls these inside jit: it builds the optimizer with a
    unit schedule and passes the current host lr into the jitted apply step
    as a traced scalar that scales the final updates — exact for every
    optimizer where lr enters linearly at the end (all but nag, which
    build_optimizer rejects). Hook names/semantics mirror the reference's
    FairseqLRScheduler: step_update after every update, step_begin_epoch /
    step (here step_epoch) at epoch boundaries."""

    host_driven = True
    lr: float = 0.0

    def __call__(self, step):  # pragma: no cover - guard
        raise TypeError(
            f"{type(self).__name__} is host-driven; the trainer must pass "
            "lr_value into the apply step instead of tracing the schedule")

    def step_update(self, num_updates: int) -> float:
        return self.lr

    def step_begin_epoch(self, epoch: int) -> float:
        return self.lr

    def step_epoch(self, epoch: int, val_loss=None) -> float:
        return self.lr

    def state_dict(self):
        return {"lr": self.lr}

    def load_state_dict(self, sd):
        self.lr = float(sd.get("lr", self.lr))


def _parse_manual_table(spec) -> dict:
    """Reference manual_lr_scheduler.py:34-52 key grammar: "1,2,3": lr
    (comma list), "4-8": lr (inclusive range), "9": lr."""
    import ast

    if isinstance(spec, str):
        spec = ast.literal_eval(spec.replace(" ", ""))
    if not isinstance(spec, dict):
        raise ValueError("epoch2lr/update2lr must evaluate to a dict")
    out = {}
    for key, val in spec.items():
        if isinstance(key, int):
            out[key] = float(val)
        elif "," in key:
            for k in key.split(","):
                out[int(k)] = float(val)
        elif "-" in key:
            s, e = key.split("-")
            for k in range(int(s), int(e) + 1):
                out[k] = float(val)
        else:
            out[int(key)] = float(val)
    return out


class ManualSchedule(HostDrivenSchedule):
    """--lr-scheduler manual (reference manual_lr_scheduler.py): lr looked
    up from --epoch2lr at epoch starts and --update2lr after each update;
    between table entries the largest key <= current applies; before any
    entry the lr is left unchanged."""

    def __init__(self, cfg):
        self.epoch2lr = _parse_manual_table(cfg.get("epoch2lr", "{}"))
        self.update2lr = _parse_manual_table(cfg.get("update2lr", "{}"))
        if 1 in self.epoch2lr:
            self.lr = self.epoch2lr[1]
        elif 1 in self.update2lr:
            self.lr = self.update2lr[1]
        else:
            self.lr = float(cfg.get("lr", 5e-4))

    def _lookup(self, table, key):
        keys = [k for k in table if k <= key]
        return table[max(keys)] if keys else self.lr

    def step_begin_epoch(self, epoch):
        self.lr = self._lookup(self.epoch2lr, epoch)
        return self.lr

    def step_update(self, num_updates):
        self.lr = self._lookup(self.update2lr, num_updates)
        return self.lr


@register_lr_schedule("manual")
def manual(cfg):
    return ManualSchedule(cfg)


class ReduceLROnPlateauSchedule(HostDrivenSchedule):
    """--lr-scheduler reduce_lr_on_plateau (reference
    reduce_lr_on_plateau.py:57-146, which wraps
    torch.optim.lr_scheduler.ReduceLROnPlateau with torch defaults:
    threshold_mode='rel', cooldown=0, min_lr=0, eps=1e-8): optional linear
    warmup, then shrink lr by lr_shrink after lr_patience epochs without a
    significant validation improvement."""

    def __init__(self, cfg):
        lr = float(cfg.get("lr", 5e-4))
        self.factor = float(cfg.get("lr_shrink", 0.1))
        self.threshold = float(cfg.get("lr_threshold", 1e-4))
        self.patience = int(cfg.get("lr_patience", 0))
        self.mode = ("max" if cfg.get("maximize_best_checkpoint_metric")
                     else "min")
        self.warmup_updates = int(cfg.get("warmup_updates", 0))
        init_lr = float(cfg.get("warmup_init_lr", -1))
        if init_lr < 0:
            init_lr = 0.0 if self.warmup_updates > 0 else lr
        self.warmup_init_lr = init_lr
        self.lr_step_size = ((lr - init_lr) / self.warmup_updates
                             if self.warmup_updates > 0 else 0.0)
        self.warmup_end = self.warmup_updates <= 0
        self.lr = lr if self.warmup_end else init_lr
        # torch ReduceLROnPlateau state (defaults the reference relies on)
        self.cooldown = 0
        self.min_lr = 0.0
        self.eps = 1e-8
        self.best = float("-inf") if self.mode == "max" else float("inf")
        self.num_bad_epochs = 0
        self.cooldown_counter = 0
        self.last_epoch = 0

    def _is_better(self, a, best):
        if self.mode == "min":  # threshold_mode='rel'
            return a < best * (1.0 - self.threshold)
        return a > best * (1.0 + self.threshold)

    def step_update(self, num_updates):
        if self.warmup_updates > 0:
            if num_updates <= self.warmup_updates:
                self.lr = self.warmup_init_lr + num_updates * self.lr_step_size
            elif not self.warmup_end:
                self.warmup_end = True
        return self.lr

    def step_epoch(self, epoch, val_loss=None):
        if val_loss is None or not self.warmup_end:
            self.last_epoch = epoch
            return self.lr
        # torch ReduceLROnPlateau.step(metrics) semantics
        self.last_epoch += 1
        if self._is_better(float(val_loss), self.best):
            self.best = float(val_loss)
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if self.lr - new_lr > self.eps:
                self.lr = new_lr
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr

    def state_dict(self):
        return {
            "lr": self.lr, "best": self.best, "last_epoch": self.last_epoch,
            "num_bad_epochs": self.num_bad_epochs,
            "cooldown_counter": self.cooldown_counter,
            "warmup_end": self.warmup_end,
        }

    def load_state_dict(self, sd):
        self.lr = float(sd.get("lr", self.lr))
        if "best" in sd:
            self.best = float(sd["best"])
        self.last_epoch = int(sd.get("last_epoch", self.last_epoch))
        self.num_bad_epochs = int(sd.get("num_bad_epochs", 0))
        self.cooldown_counter = int(sd.get("cooldown_counter", 0))
        self.warmup_end = bool(sd.get("warmup_end", self.warmup_end))


@register_lr_schedule("reduce_lr_on_plateau")
def reduce_lr_on_plateau(cfg):
    return ReduceLROnPlateauSchedule(cfg)


@register_lr_schedule("tri_stage")
def tri_stage(cfg):
    lr = float(cfg.get("lr", 5e-4))
    warmup = int(cfg.get("warmup_steps", cfg.get("warmup_updates", 4000)))
    hold = int(cfg.get("hold_steps", 0))
    decay = int(cfg.get("decay_steps", 50000))
    init_scale = float(cfg.get("init_lr_scale", 0.01))
    final_scale = float(cfg.get("final_lr_scale", 0.01))
    import math

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        warm = lr * (init_scale + (1 - init_scale) * jnp.minimum(step / max(warmup, 1), 1.0))
        decay_rate = -math.log(final_scale) / max(decay, 1)
        in_decay = jnp.clip(step - warmup - hold, 0, decay)
        decayed = lr * jnp.exp(-decay_rate * in_decay)
        return jnp.where(
            step < warmup, warm, jnp.where(step < warmup + hold, lr, decayed)
        )

    return schedule


def build_lr_schedule(cfg):
    from diffnorm_tpu.registry import LR_SCHEDULES

    name = cfg.get("lr_scheduler", "inverse_sqrt")
    return LR_SCHEDULES.get(name)(cfg)
