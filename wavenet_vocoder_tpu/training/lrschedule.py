"""Learning-rate schedules (reference: lrschedule.py:5-35), as pure functions
of the step — jittable, composable with optax via ``optax.scale_by_schedule``.

Selected by name from config (reference: train.py:712-718 does
``getattr(lrschedule, hparams.lr_schedule)``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

import jax.numpy as jnp


def noam_learning_rate_decay(init_lr: float, global_step,
                             warmup_steps: int = 4000):
    """Noam/tensor2tensor scheme (reference: lrschedule.py:5-11)."""
    warmup_steps = float(warmup_steps)
    step = jnp.asarray(global_step, dtype=jnp.float32) + 1.0
    return init_lr * warmup_steps ** 0.5 * jnp.minimum(
        step * warmup_steps ** -1.5, step ** -0.5)


def step_learning_rate_decay(init_lr: float, global_step,
                             anneal_rate: float = 0.98,
                             anneal_interval: int = 30000):
    """x anneal_rate every anneal_interval steps
    (reference: lrschedule.py:14-17; default config uses 0.5 / 200k,
    hparams.py:100-101)."""
    step = jnp.asarray(global_step)
    return init_lr * anneal_rate ** (step // anneal_interval).astype(jnp.float32)


def cyclic_cosine_annealing(init_lr: float, global_step, T: int, M: int):
    """SGDR cyclic cosine (reference: lrschedule.py:20-35)."""
    TdivM = T // M
    step = jnp.asarray(global_step, dtype=jnp.float32)
    return init_lr / 2.0 * (jnp.cos(jnp.pi * ((step - 1) % TdivM) / TdivM) + 1.0)


SCHEDULES: Dict[str, Callable] = {
    "noam_learning_rate_decay": noam_learning_rate_decay,
    "step_learning_rate_decay": step_learning_rate_decay,
    "cyclic_cosine_annealing": cyclic_cosine_annealing,
}


def make_schedule(name: str, init_lr: float,
                  kwargs: Dict[str, Any]) -> Callable:
    """Build step -> lr (reference selection: train.py:712-718)."""
    if name is None or name == "none" or name == "":
        return lambda step: jnp.asarray(init_lr, dtype=jnp.float32)
    fn = SCHEDULES[name]
    return lambda step: fn(init_lr, step, **kwargs)
