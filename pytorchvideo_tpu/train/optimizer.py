"""Optimizer construction with BN / zero-weight-decay parameter groups + LARS.

Parity: pytorchvideo_trainer/module/optimizer.py:26-236. optax-based: the
reference's parameter groups become optax.multi_transform partitions over
the params pytree; LARS is trust-ratio scaling applied to non-BN params
(reference LARS wrapper, optimizer.py:150-236, ignore_1d_param=True).

The per-step closed-form LR (the reference's manual_update_lr,
module/video_classification.py:161-180) is an optax schedule built from
LRSchedulerConfig by :func:`lr_schedule_from_config` (jnp ops, jit-safe).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import optax

from pytorchvideo_tpu.train.lr_policy import LRSchedulerConfig


@dataclass
class OptimizerConfig:
    method: str = "sgd"  # sgd | adam | adamw
    lr: float = 0.1
    momentum: float = 0.9
    weight_decay: float = 1e-4
    bn_weight_decay: float = 0.0
    nesterov: bool = False
    zero_weight_decay_1d_param: bool = False
    lars_on: bool = False


def _param_labels(params, zero_wd_1d: bool):
    """Label each leaf: 'bn' (norm scale/bias), 'zero' (1-D / bias), 'main'."""

    def label(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        if "bn" in names or "ln" in names:
            return "bn"
        if zero_wd_1d and (leaf.ndim <= 1 or names[-1] == "bias"):
            return "zero"
        return "main"

    return jax.tree_util.tree_map_with_path(label, params)


def lr_schedule_from_config(
    cfg: LRSchedulerConfig, steps_per_epoch: int
) -> optax.Schedule:
    """jnp closed-form schedule matching lr_policy.get_lr_at_epoch."""

    def schedule(step):
        cur_epoch = step / steps_per_epoch
        if cfg.lr_policy == "cosine":
            offset = cfg.warmup_iters if cfg.cosine_after_warmup else 0.0

            def cosine(e):
                return cfg.cosine_end_lr + (cfg.lr - cfg.cosine_end_lr) * (
                    jnp.cos(jnp.pi * (e - offset) / (cfg.max_iters - offset)) + 1.0
                ) * 0.5

            lr = cosine(cur_epoch)
            if cfg.warmup_iters > 0:
                lr_end = cosine(jnp.asarray(float(cfg.warmup_iters)))
                alpha = (lr_end - cfg.warmup_start_lr) / cfg.warmup_iters
                warm = cur_epoch * alpha + cfg.warmup_start_lr
                lr = jnp.where(cur_epoch < cfg.warmup_iters, warm, lr)
            return lr
        if cfg.lr_policy == "steps_with_relative_lrs":
            steps = jnp.asarray(list(cfg.steps) + [cfg.max_iters], jnp.float32)
            idx = jnp.clip(
                jnp.searchsorted(steps, cur_epoch, side="right") - 1,
                0,
                len(cfg.lrs) - 1,
            )
            lr = jnp.asarray(cfg.lrs)[idx] * cfg.lr
            if cfg.warmup_iters > 0:
                lr_end = jnp.asarray(cfg.lrs)[0] * cfg.lr
                alpha = (lr_end - cfg.warmup_start_lr) / cfg.warmup_iters
                warm = cur_epoch * alpha + cfg.warmup_start_lr
                lr = jnp.where(cur_epoch < cfg.warmup_iters, warm, lr)
            return lr
        raise NotImplementedError(cfg.lr_policy)

    return schedule


def construct_optimizer(
    params,
    cfg: OptimizerConfig,
    lr_schedule: optax.Schedule | float | None = None,
) -> optax.GradientTransformation:
    """Build the optax chain mirroring the reference's param groups."""
    labels = _param_labels(params, cfg.zero_weight_decay_1d_param)
    wd = {"bn": cfg.bn_weight_decay, "zero": 0.0, "main": cfg.weight_decay}
    if lr_schedule is None:
        lr_schedule = cfg.lr

    chain = []
    if cfg.method == "sgd":
        chain.append(
            optax.multi_transform(
                {g: optax.add_decayed_weights(wd[g]) for g in wd}, labels
            )
        )
        if cfg.lars_on:
            chain.append(
                optax.multi_transform(
                    {
                        "main": optax.scale_by_trust_ratio(),
                        "zero": optax.scale_by_trust_ratio(),
                        "bn": optax.identity(),
                    },
                    labels,
                )
            )
        chain.append(
            optax.trace(decay=cfg.momentum, nesterov=cfg.nesterov)
        )
    elif cfg.method == "adam":
        chain.append(optax.scale_by_adam(b1=0.9, b2=0.999))
        chain.append(
            optax.multi_transform(
                {g: optax.add_decayed_weights(wd[g]) for g in wd}, labels
            )
        )
    elif cfg.method == "adamw":
        chain.append(optax.scale_by_adam(eps=1e-8))
        chain.append(
            optax.multi_transform(
                {g: optax.add_decayed_weights(wd[g]) for g in wd}, labels
            )
        )
    else:
        raise NotImplementedError(f"optimizer {cfg.method}")

    if callable(lr_schedule):
        chain.append(optax.scale_by_schedule(lambda step: -lr_schedule(step)))
    else:
        chain.append(optax.scale(-float(lr_schedule)))
    return optax.chain(*chain)
