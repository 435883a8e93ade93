"""Optimizer and LR-schedule factories on optax.

Replaces the reference's torch factories (`utils/__init__.py:24-76` +
`utils/warmup_scheduler.py:4-58`) with optax equivalents exposed under the
same flag names (`opt.py:75-103`):

    optimizers: sgd | adam | radam | ranger (RAdam + Lookahead, matching
                torch_optimizer.Ranger at `utils/__init__.py:52-53`)
    schedulers: const | steplr | cosine | poly, each optionally wrapped in
                the GradualWarmupScheduler ramp over `warmup_epochs` epochs

The reference steps its scheduler per *epoch*; we reproduce that by making
the schedule a step function of `epoch = step // steps_per_epoch`.

Warmup handoff semantics (`utils/warmup_scheduler.py:23-32`): epochs
0..warmup_epochs inclusive ramp `base_lr -> base_lr * multiplier`
linearly; from epoch warmup_epochs+1 on, the after-scheduler runs with its
OWN epoch counter starting at 0 and with `base_lrs` rescaled to
`base_lr * multiplier` (the `self.after_scheduler.base_lrs = base_lr *
multiplier` handoff at `warmup_scheduler.py:27`).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from nsff_pl_tpu.config import NSFFConfig

EPS = 1e-8  # utils/__init__.py:28,60


def make_lr_schedule(cfg: NSFFConfig, steps_per_epoch: int):
    """Return a schedule fn step -> lr matching the reference's per-epoch
    schedulers (`utils/__init__.py:59-76`)."""
    base_lr = cfg.lr
    # radam/ranger skip the warmup wrap (`utils/__init__.py:72`)
    warmup = cfg.warmup_epochs \
        if cfg.optimizer not in ("radam", "ranger") else 0
    mult = cfg.warmup_multiplier if warmup > 0 else 1.0

    def after(e, base):
        """The after-scheduler at its own epoch counter `e` with base lr
        `base` (closed forms of MultiStepLR / CosineAnnealingLR / the poly
        LambdaLR, `utils/__init__.py:61-68`)."""
        if cfg.lr_scheduler == "const":
            return base + 0.0 * e  # broadcasts when e is traced
        if cfg.lr_scheduler == "steplr":
            lr = jnp.asarray(base, jnp.float32)
            for m in sorted(cfg.decay_step):
                lr = lr * (cfg.decay_gamma ** (e >= m))
            return lr
        if cfg.lr_scheduler == "cosine":
            return EPS + (base - EPS) * 0.5 * (
                1 + jnp.cos(jnp.pi * e / cfg.num_epochs))
        if cfg.lr_scheduler == "poly":
            return base * (1 - e / cfg.num_epochs) ** cfg.poly_exp
        raise ValueError(f"scheduler {cfg.lr_scheduler} not recognized!")

    def sched(step):
        e = step // max(steps_per_epoch, 1)
        if warmup <= 0:
            return after(e, base_lr)
        # linear ramp over epochs 0..warmup inclusive
        # (`warmup_scheduler.py:32`); the after-scheduler takes over at
        # epoch warmup+1 with its epoch counter at 0 and base_lr*mult
        warm = base_lr * ((mult - 1.0) * e / warmup + 1.0)
        post = after(jnp.maximum(e - (warmup + 1), 0), base_lr * mult)
        return jnp.where(e <= warmup, warm, post)

    return sched


class LookaheadState(NamedTuple):
    inner: optax.OptState
    slow: optax.Params
    count: jnp.ndarray


def lookahead(inner: optax.GradientTransformation, sync_period: int = 6,
              slow_step_size: float = 0.5) -> optax.GradientTransformation:
    """Lookahead (Zhang et al. 2019) as a self-contained transformation.

    Unlike `optax.lookahead`, the slow weights live in the optimizer
    *state*, so model params remain a plain pytree — rendering,
    checkpointing and the train step are unaffected. Semantics match
    pytorch Lookahead (torch_optimizer.Ranger's outer loop): every
    `sync_period` steps, slow += alpha * (fast - slow) and fast := slow.
    """

    def init(params):
        # jnp.copy (not asarray): slow must NOT alias the param buffers,
        # or donate_argnums would donate the same buffer twice
        return LookaheadState(inner=inner.init(params),
                              slow=jax.tree.map(jnp.copy, params),
                              count=jnp.zeros((), jnp.int32))

    def update(updates, state, params=None):
        if params is None:
            raise ValueError("lookahead requires params in update()")
        inner_updates, inner_state = inner.update(updates, state.inner,
                                                  params)
        count = state.count + 1
        sync = (count % sync_period) == 0
        # tentative fast weights after the inner update
        slow_next = jax.tree.map(
            lambda s, p, u: s + slow_step_size * ((p + u) - s),
            state.slow, params, inner_updates)
        out_updates = jax.tree.map(
            lambda u, sn, p: jnp.where(sync, sn - p, u),
            inner_updates, slow_next, params)
        new_slow = jax.tree.map(lambda s, sn: jnp.where(sync, sn, s),
                                state.slow, slow_next)
        return out_updates, LookaheadState(inner_state, new_slow, count)

    return optax.GradientTransformation(init, update)


def make_optimizer(cfg: NSFFConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """Build the optax chain for the configured optimizer
    (`utils/__init__.py:24-57`)."""
    sched = make_lr_schedule(cfg, steps_per_epoch)

    # Weight-decay semantics follow each reference optimizer exactly:
    # - torch SGD / torch Adam apply COUPLED L2 (decay added to the grad
    #   before the moment updates) -> add_decayed_weights BEFORE the
    #   transform;
    # - torch_optimizer.RAdam / .Ranger apply DECOUPLED, lr-scaled decay
    #   (p -= wd * lr * p after the adaptive step) -> add_decayed_weights
    #   AFTER scale_by_radam, inside the final lr scaling.
    if cfg.optimizer == "sgd":
        tx = optax.sgd(learning_rate=sched, momentum=cfg.momentum)
        if cfg.weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    elif cfg.optimizer == "adam":
        tx = optax.adam(learning_rate=sched, eps=EPS)
        if cfg.weight_decay > 0:
            tx = optax.chain(optax.add_decayed_weights(cfg.weight_decay), tx)
    elif cfg.optimizer in ("radam", "ranger"):
        parts = [optax.scale_by_radam(eps=EPS)]
        if cfg.weight_decay > 0:
            parts.append(optax.add_decayed_weights(cfg.weight_decay))
        parts.append(optax.scale_by_learning_rate(sched))
        tx = optax.chain(*parts)
        if cfg.optimizer == "ranger":
            # Ranger = RAdam + Lookahead(k=6, alpha=0.5)
            # (torch_optimizer.Ranger defaults, utils/__init__.py:52-53)
            tx = lookahead(tx, sync_period=6, slow_step_size=0.5)
    else:
        raise ValueError(f"optimizer {cfg.optimizer} not recognized!")
    return tx
