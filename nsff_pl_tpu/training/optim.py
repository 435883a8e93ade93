"""Optimizer and LR-schedule factories on optax.

Replaces the reference's torch factories (`utils/__init__.py:24-76` +
`utils/warmup_scheduler.py:4-58`) with optax equivalents exposed under the
same flag names (`opt.py:75-103`):

    optimizers: sgd | adam | radam | ranger(-> lamb-free fallback: radam+lookahead)
    schedulers: const | steplr | cosine | poly, each optionally wrapped in a
                linear warmup over `warmup_epochs` epochs

The reference steps its scheduler per *epoch*; we reproduce that by making
the schedule a step function of `epoch = step // steps_per_epoch`.
"""
from __future__ import annotations

from typing import Optional

import optax

from nsff_pl_tpu.config import NSFFConfig

EPS = 1e-8  # utils/__init__.py:28


def make_lr_schedule(cfg: NSFFConfig, steps_per_epoch: int):
    """Return an optax schedule fn step -> lr matching the reference's
    per-epoch schedules (`utils/__init__.py:59-76`)."""
    base_lr = cfg.lr

    def epoch_of(step):
        return step // max(steps_per_epoch, 1)

    if cfg.lr_scheduler == "const":
        def sched(step):
            return base_lr
    elif cfg.lr_scheduler == "steplr":
        milestones = sorted(cfg.decay_step)

        def sched(step):
            e = epoch_of(step)
            lr = base_lr
            for m in milestones:
                lr = lr * (cfg.decay_gamma ** (e >= m))
            return lr
    elif cfg.lr_scheduler == "cosine":
        import jax.numpy as jnp

        def sched(step):
            e = epoch_of(step)
            return EPS + (base_lr - EPS) * 0.5 * (
                1 + jnp.cos(jnp.pi * e / cfg.num_epochs))
    elif cfg.lr_scheduler == "poly":
        def sched(step):
            e = epoch_of(step)
            return base_lr * (1 - e / cfg.num_epochs) ** cfg.poly_exp
    else:
        raise ValueError(f"scheduler {cfg.lr_scheduler} not recognized!")

    if cfg.warmup_epochs > 0 and cfg.optimizer not in ("radam", "ranger"):
        # GradualWarmupScheduler: ramp base_lr -> base_lr*multiplier over
        # warmup_epochs, then hand off (utils/warmup_scheduler.py:22-33)
        mult = cfg.warmup_multiplier

        def warmed(step):
            e = epoch_of(step)
            warm = base_lr * ((mult - 1.0) * e / cfg.warmup_epochs + 1.0)
            import jax.numpy as jnp

            after = sched(step) * mult / 1.0 if cfg.lr_scheduler == "const" \
                else sched(step)
            return jnp.where(e <= cfg.warmup_epochs, warm, after)

        return warmed
    return sched


def make_optimizer(cfg: NSFFConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build the optax chain for the configured optimizer
    (`utils/__init__.py:24-57`)."""
    sched = make_lr_schedule(cfg, steps_per_epoch)

    if cfg.optimizer == "sgd":
        tx = optax.sgd(learning_rate=sched, momentum=cfg.momentum)
        if cfg.weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    elif cfg.optimizer == "adam":
        tx = optax.adamw(learning_rate=sched, eps=EPS,
                         weight_decay=cfg.weight_decay) \
            if cfg.weight_decay > 0 else optax.adam(learning_rate=sched, eps=EPS)
    elif cfg.optimizer == "radam":
        tx = optax.radam(learning_rate=sched, eps=EPS)
        if cfg.weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    elif cfg.optimizer == "ranger":
        # Ranger = RAdam + Lookahead (torch_optimizer.Ranger,
        # utils/__init__.py:52-53)
        inner = optax.radam(learning_rate=sched, eps=EPS)
        tx = optax.lookahead(inner, sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(f"optimizer {cfg.optimizer} not recognized!")
    return tx


def wrap_params_for_optimizer(cfg: NSFFConfig, params):
    """Ranger/lookahead needs LookaheadParams; others use params directly."""
    if cfg.optimizer == "ranger":
        return optax.LookaheadParams.init_synced(params)
    return params
