"""Optimizer + LR schedule construction (optax).

Matches the reference's training recipe: AdamW (betas 0.9/0.98, lr 2e-4,
weight decay 0) with global-norm grad clipping at 1.0
(reference: modules/FastDiff/task/FastDiff.py:121-125,
config/base.yaml:98-103, tasks/base_task.py:231-235). The 'rsqrt' schedule
(reference: utils/common_schedulers.py:24-49) is provided for the TTS tasks;
the vocoder path uses constant LR (base_task.py:163 returns no scheduler).
"""

from __future__ import annotations

import optax

from fastdiff_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig, warmup_updates: int = 8000,
                     hidden_size: int = 256):
    if cfg.scheduler == "rsqrt":
        def schedule(step):
            import jax.numpy as jnp
            s = jnp.maximum(step, 1)
            warm = jnp.minimum(s / warmup_updates, 1.0)
            rsqrt_decay = jnp.maximum(warmup_updates, s) ** -0.5
            rsqrt_hidden = hidden_size ** -0.5
            return jnp.maximum(cfg.lr * warm * rsqrt_decay * rsqrt_hidden, 1e-7)
        return schedule
    return cfg.lr


def make_optimizer(cfg: TrainConfig, warmup_updates: int = 8000,
                   hidden_size: int = 256) -> optax.GradientTransformation:
    tx = []
    if cfg.clip_grad_norm > 0:
        tx.append(optax.clip_by_global_norm(cfg.clip_grad_norm))
    tx.append(optax.adamw(
        learning_rate=make_lr_schedule(cfg, warmup_updates, hidden_size),
        b1=cfg.adam_beta1, b2=cfg.adam_beta2,
        weight_decay=cfg.weight_decay))
    if cfg.accumulate_grad_batches > 1:
        return optax.MultiSteps(optax.chain(*tx),
                                every_k_schedule=cfg.accumulate_grad_batches)
    return optax.chain(*tx)
