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
