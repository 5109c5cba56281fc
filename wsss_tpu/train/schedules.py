"""LR schedules matching the reference's three training stacks.

  * Cyclic LR (triangular) — the missing ``clr_callback.CyclicLR`` used by
    01_train/demo.py:90-110, rebuilt from Keras-CLR behavior: triangular
    wave between base_lr and max_lr with half-cycle ``step_size``.
  * Step decay — 01_train's lr-drop path and 03a's 0.5x every 4 epochs
    (model.py:38-39,493).
  * Poly decay — 03b's PolyOptimizer (missing misc.torchutils;
    train_irn.py:87-90): lr * (1 - step/max_step)**0.9.
"""
from __future__ import annotations

import optax


def cyclic_lr(base_lr: float, max_lr: float, step_size: int):
    def sched(count):
        import jax.numpy as jnp
        cycle = jnp.floor(1 + count / (2 * step_size))
        x = jnp.abs(count / step_size - 2 * cycle + 1)
        return base_lr + (max_lr - base_lr) * jnp.maximum(0., 1. - x)
    return sched


def step_decay(base_lr: float, drop: float, steps_per_drop: int):
    def sched(count):
        return base_lr * (drop ** (count // steps_per_drop))
    return sched


def poly_decay(base_lr: float, max_step: int, power: float = 0.9):
    def sched(count):
        import jax.numpy as jnp
        frac = jnp.clip(count / max_step, 0.0, 1.0)
        return base_lr * (1.0 - frac) ** power
    return sched


def sgd_nesterov(lr, momentum: float = 0.9, weight_decay: float = 0.0):
    """SGD + Nesterov momentum (01_train/demo.py:60-61)."""
    tx = optax.sgd(lr, momentum=momentum, nesterov=True)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx
