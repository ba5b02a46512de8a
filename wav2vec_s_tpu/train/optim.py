"""Optimizer construction (optax) with fairseq-equivalent semantics.

Re-provides fairseq/fairseq/optim/: ``FairseqAdam`` (betas (0.9, 0.98),
eps 1e-6, decoupled weight decay), adafactor, global-norm clipping
(trainer.py:775-787), and gradient skip-on-nonfinite (the bf16-native
replacement for fp16 DynamicLossScaler + NanDetector re-runs,
trainer.py:801-811 — on TPU we train in bf16 compute / fp32 master params, so
overflow scaling is unnecessary; a nonfinite global grad-norm simply skips
the step, mirroring the scaler's skip behavior).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"
    lr: float = 5e-4
    adam_betas: tuple = (0.9, 0.98)
    adam_eps: float = 1e-6
    weight_decay: float = 0.01
    clip_norm: float = 0.0           # 0 disables (pretrain); fine-tune uses 2.0
    skip_nonfinite: bool = True
    # schedule
    lr_scheduler: str = "polynomial_decay"
    warmup_updates: int = 5000
    total_updates: int = 400000
    warmup_init_lr: float = 1e-7
    # tri_stage (the simultaneous-ASR fine-tune schedule,
    # train_wav2vec_s_caat_simulasr_base.sh: --lr-scheduler tri_stage
    # --phase-ratio '[0.1, 0.3, 0.6]' --final-lr-scale 0.05): fractions of
    # total_updates spent in warmup / hold / decay
    phase_ratio: tuple = (0.1, 0.3, 0.6)
    init_lr_scale: float = 0.01
    final_lr_scale: float = 0.05


def build_schedule(cfg: OptimConfig) -> Callable:
    from wav2vec_s_tpu.train.lr_schedules import SCHEDULES
    if cfg.lr_scheduler == "polynomial_decay":
        return SCHEDULES["polynomial_decay"](
            cfg.lr, cfg.warmup_updates, cfg.total_updates)
    if cfg.lr_scheduler == "inverse_sqrt":
        return SCHEDULES["inverse_sqrt"](
            cfg.lr, cfg.warmup_updates, cfg.warmup_init_lr)
    if cfg.lr_scheduler == "cosine":
        return SCHEDULES["cosine"](cfg.lr, cfg.warmup_updates, cfg.total_updates)
    if cfg.lr_scheduler == "tri_stage":
        w, h, d = (int(r * cfg.total_updates) for r in cfg.phase_ratio)
        return SCHEDULES["tri_stage"](
            cfg.lr, w, h, d, init_lr_scale=cfg.init_lr_scale,
            final_lr_scale=cfg.final_lr_scale)
    raise ValueError(cfg.lr_scheduler)


def build_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    sched = build_schedule(cfg)
    chain = []
    if cfg.clip_norm and cfg.clip_norm > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_norm))
    if cfg.optimizer == "adam":
        chain.append(optax.scale_by_adam(
            b1=cfg.adam_betas[0], b2=cfg.adam_betas[1], eps=cfg.adam_eps))
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay))
    elif cfg.optimizer == "adafactor":
        return optax.adafactor(learning_rate=sched)
    else:
        raise ValueError(cfg.optimizer)
    chain.append(optax.scale_by_learning_rate(sched))
    return optax.chain(*chain)
