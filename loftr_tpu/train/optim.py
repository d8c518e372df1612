"""Optimizer + LR schedule factory (optax).

Reimplements /root/reference/src/optimizers/__init__.py:5-42 (Adam/AdamW,
MultiStepLR / CosineAnnealing / ExponentialLR) and the manual linear warmup
override from /root/reference/src/lightning/lightning_loftr.py:60-80 as a
single optax schedule.  The linear LR-scaling rule (train.py:70-77) is
applied by the caller via ``Config.scaled_lr``.

Gradient clipping by global norm 0.5 matches PL's
``gradient_clip_val=0.5`` (train.py:109, default.py:155).
"""
from __future__ import annotations

import jax.numpy as jnp
import optax

from loftr_tpu.config import TrainerConfig


def lr_schedule(cfg: TrainerConfig, true_lr: float, warmup_step: int):
    """Returns f(step) -> lr.

    Warmup (lightning_loftr.py:66-77): 'linear' ramps from
    warmup_ratio*true_lr to true_lr over warmup_step steps; 'constant' holds
    warmup_ratio*true_lr.  Afterwards the base scheduler takes over, with
    epoch-interval schedules driven by steps_per_epoch.
    """
    milestones = jnp.asarray(cfg.mslr_milestones)

    def sched(step):
        step = jnp.asarray(step, jnp.float32)
        if cfg.scheduler_interval == "epoch":
            assert cfg.steps_per_epoch > 0, \
                "steps_per_epoch required for epoch-interval schedules"
            t = step // cfg.steps_per_epoch
        else:
            t = step

        if cfg.scheduler == "MultiStepLR":
            factor = cfg.mslr_gamma ** jnp.sum(milestones <= t)
        elif cfg.scheduler == "CosineAnnealing":
            factor = 0.5 * (1 + jnp.cos(jnp.pi * t / cfg.cosa_tmax))
        elif cfg.scheduler == "ExponentialLR":
            factor = cfg.elr_gamma ** t
        else:
            raise ValueError(cfg.scheduler)

        base = true_lr * factor
        if cfg.warmup_type == "linear":
            wu = cfg.warmup_ratio * true_lr + \
                (true_lr - cfg.warmup_ratio * true_lr) * \
                jnp.minimum(step, warmup_step) / max(warmup_step, 1)
        elif cfg.warmup_type == "constant":
            wu = cfg.warmup_ratio * true_lr
        else:
            raise ValueError(cfg.warmup_type)
        return jnp.where(step < warmup_step, wu, base)

    return sched


def build_optimizer(cfg: TrainerConfig, true_lr: float, warmup_step: int
                    ) -> optax.GradientTransformation:
    """Adam/AdamW with warmup schedule and global-norm clipping."""
    sched = lr_schedule(cfg, true_lr, warmup_step)
    if cfg.optimizer == "adam":
        opt = optax.adam(sched)
        if cfg.adam_decay > 0:
            opt = optax.chain(optax.add_decayed_weights(cfg.adam_decay), opt)
    elif cfg.optimizer == "adamw":
        opt = optax.adamw(sched, weight_decay=cfg.adamw_decay)
    else:
        raise ValueError(cfg.optimizer)
    return optax.chain(optax.clip_by_global_norm(cfg.gradient_clipping), opt)
