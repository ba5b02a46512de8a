"""LR schedules with fairseq semantics.

Twins of fairseq/fairseq/optim/lr_scheduler/: ``polynomial_decay`` (used by
pre-training: warmup 5000, 400k updates, lr 5e-4) and ``inverse_sqrt`` (used
by CAAT fine-tuning: warmup 4000, warmup-init 1e-7), plus cosine and
tri-stage.  All are pure step -> lr functions usable with optax.
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_decay(lr: float, warmup_updates: int, total_updates: int,
                     end_lr: float = 0.0, power: float = 1.0):
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.minimum(step / jnp.maximum(warmup_updates, 1), 1.0)
        warm_lr = lr * warm
        frac = jnp.clip((total_updates - step)
                        / jnp.maximum(total_updates - warmup_updates, 1), 0, 1)
        decay_lr = (lr - end_lr) * frac ** power + end_lr
        return jnp.where(step < warmup_updates, warm_lr, decay_lr)
    return sched


def inverse_sqrt(lr: float, warmup_updates: int, warmup_init_lr: float = 1e-7):
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        lin = warmup_init_lr + step * (lr - warmup_init_lr) / jnp.maximum(
            warmup_updates, 1)
        decay = lr * (warmup_updates ** 0.5) * jnp.maximum(step, 1.0) ** -0.5
        return jnp.where(step < warmup_updates, lin, decay)
    return sched


def cosine(lr: float, warmup_updates: int, total_updates: int,
           min_lr: float = 0.0):
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm_lr = lr * step / jnp.maximum(warmup_updates, 1)
        t = jnp.clip((step - warmup_updates)
                     / jnp.maximum(total_updates - warmup_updates, 1), 0, 1)
        cos_lr = min_lr + 0.5 * (lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where(step < warmup_updates, warm_lr, cos_lr)
    return sched


def tri_stage(lr: float, warmup_updates: int, hold_updates: int,
              decay_updates: int, init_lr_scale: float = 0.01,
              final_lr_scale: float = 0.05):
    init_lr, final_lr = lr * init_lr_scale, lr * final_lr_scale
    import math
    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        warm = init_lr + (lr - init_lr) * jnp.minimum(
            step / jnp.maximum(warmup_updates, 1), 1.0)
        decay_t = jnp.clip((step - warmup_updates - hold_updates)
                           / jnp.maximum(decay_updates, 1), 0, 1)
        decay = lr * jnp.exp(jnp.log(jnp.maximum(final_lr_scale, 1e-9)) * decay_t)
        out = jnp.where(step < warmup_updates, warm,
                        jnp.where(step < warmup_updates + hold_updates, lr,
                                  jnp.maximum(decay, final_lr)))
        return out
    return sched


SCHEDULES = {
    "polynomial_decay": polynomial_decay,
    "inverse_sqrt": inverse_sqrt,
    "cosine": cosine,
    "tri_stage": tri_stage,
}
