"""LR schedules.

``cyclic_lr`` reproduces the reference's training recipe exactly:
``CyclicLR(base_lr=1e-6, max_lr=1e-4, step_size_up=4, step_size_down=60)``
stepped once per *epoch* (task1/kite/loopback.py:128, loop_seg.py:45) —
triangular mode, cycle length 64 epochs.
"""

from __future__ import annotations

import jax.numpy as jnp


def cyclic_lr(
    epoch,
    base_lr: float = 1e-6,
    max_lr: float = 1e-4,
    step_size_up: int = 4,
    step_size_down: int = 60,
):
    """Triangular cyclic LR as a pure function of (possibly traced) epoch."""
    total = step_size_up + step_size_down
    pos = jnp.asarray(epoch) % total
    up = pos / step_size_up
    down = 1.0 - (pos - step_size_up) / step_size_down
    frac = jnp.where(pos <= step_size_up, up, down)
    return base_lr + (max_lr - base_lr) * jnp.clip(frac, 0.0, 1.0)


def make_stepwise(schedule_per_epoch, steps_per_epoch: int):
    """Adapt a per-epoch schedule to an optax per-step schedule."""

    def sched(step):
        return schedule_per_epoch(step // max(steps_per_epoch, 1))

    return sched
