"""Profiling / tracing helpers (the aux subsystem the reference lacks,
SURVEY.md section 5.1).

``trace(logdir)`` wraps ``jax.profiler`` for TensorBoard-viewable device
traces; ``StepTimer`` gives robust wall-time stats that survive this
environment's async-dispatch quirks by forcing a device->host sync on a
scalar before reading the clock.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler device trace into ``logdir`` (view in
    TensorBoard's profile plugin)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def sync(x) -> None:
    """Force real completion: fetch a scalar reduction to host. This, unlike
    ``block_until_ready``, is reliable under remote-execution relays."""
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.sum() if hasattr(leaf, "sum") else leaf))


class StepTimer:
    """Accumulates per-step wall times; ``summary()`` -> mean/p50/p90."""

    def __init__(self):
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            sync(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "steps_per_s": float(1.0 / arr.mean()),
            "n": int(arr.size),
        }
