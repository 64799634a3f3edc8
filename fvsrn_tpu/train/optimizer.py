"""Optimizer wrapper: optax Adam (or others) + StepLR schedule.

Rebuild of ``Optimizer`` (reference: applications/volnet/optimizer.py:11-60):
configurable optimizer class, lr, and a StepLR schedule decaying by
``lr_gamma`` every ``lr_step`` epochs, with a ``reset`` for training-phase
changes (meta pretraining).
"""
from __future__ import annotations

from typing import Any

import optax

from ..utils.pytree import static_field, struct


def step_lr(lr: float, lr_step: int, lr_gamma: float,
            steps_per_epoch: int = 1):
    """StepLR: lr * gamma^(epoch // lr_step), as an optax schedule over
    update steps."""
    def schedule(count):
        epoch = count // steps_per_epoch
        return lr * (lr_gamma ** (epoch // lr_step))
    return schedule


def make_optimizer(optimizer: str = "Adam", lr: float = 0.01,
                   lr_step: int = 500, lr_gamma: float = 0.5,
                   steps_per_epoch: int = 1,
                   **optim_params: Any) -> optax.GradientTransformation:
    """Factory matching the reference defaults (Adam, lr=0.01,
    lr_step=500, lr_gamma=0.5)."""
    schedule = step_lr(lr, lr_step, lr_gamma, steps_per_epoch)
    name = optimizer.lower()
    if name == "adam":
        return optax.adam(schedule, **optim_params)
    if name == "adamw":
        return optax.adamw(schedule, **optim_params)
    if name == "sgd":
        return optax.sgd(schedule, **optim_params)
    if name == "rmsprop":
        return optax.rmsprop(schedule, **optim_params)
    if name in ("lbfgs",):
        return optax.lbfgs(**optim_params)
    raise ValueError(f"unknown optimizer {optimizer}")
