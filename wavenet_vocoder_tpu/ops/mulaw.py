"""Mu-law companding — dual-backend (numpy for offline preprocessing,
jax.numpy under jit on device).

The reference delegates these to ``nnmnkwii.preprocessing`` and calls them with
``mu = quantize_channels - 1`` (reference: datasets/wavallin.py:46, 82-84;
train.py:492, 582-584), i.e. the convention here is:

    mulaw(x, mu)          : [-1, 1] -> [-1, 1],  F(x) = sign(x) ln(1+mu|x|)/ln(1+mu)
    mulaw_quantize(x, mu) : [-1, 1] -> {0..mu}   (mu+1 classes)
    inverses accordingly.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _xp(x):
    """Pick numpy for host data, jax.numpy for traced/device arrays."""
    if isinstance(x, (np.ndarray, np.generic, float, int, list, tuple)):
        return np
    return jnp


def mulaw(x, mu: int = 255):
    """Mu-law companding: [-1, 1] -> [-1, 1]."""
    xp = _xp(x)
    return xp.sign(x) * xp.log1p(mu * xp.abs(x)) / xp.log1p(float(mu))


def inv_mulaw(y, mu: int = 255):
    """Inverse mu-law companding: [-1, 1] -> [-1, 1]."""
    xp = _xp(y)
    return xp.sign(y) * (1.0 / mu) * ((1.0 + mu) ** xp.abs(y) - 1.0)


def mulaw_quantize(x, mu: int = 255):
    """Mu-law companding + quantize: [-1, 1] -> {0 .. mu} (mu+1 classes)."""
    xp = _xp(x)
    y = mulaw(x, mu)
    return ((y + 1) / 2 * mu).astype(xp.int32) if xp is np else ((y + 1) / 2 * mu).astype(jnp.int32)


def inv_mulaw_quantize(y, mu: int = 255):
    """Inverse of :func:`mulaw_quantize`: {0 .. mu} -> [-1, 1]."""
    xp = _xp(y)
    y = xp.asarray(y, dtype=xp.float32)
    return inv_mulaw(2.0 * y / mu - 1.0, mu)
