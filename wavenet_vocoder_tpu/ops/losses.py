"""Masked sequence losses (reference: train.py:307-405).

All losses are mask-normalized means over valid timesteps, computed in f32.
Layout: channels-last, y_hat (B, T, C), targets (B, T) int or (B, T, 1) float,
mask (B, T, 1).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from wavenet_vocoder_tpu.ops.mixture import (
    discretized_mix_logistic_loss,
    mix_gaussian_loss,
)


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) int lengths -> (B, max_len, 1) f32 mask
    (reference: train.py:307-317)."""
    pos = jnp.arange(max_len, dtype=lengths.dtype)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)[..., None]


def masked_cross_entropy(y_hat: jnp.ndarray, y: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-element CE, mask-normalized mean (reference: train.py:346-362).

    y_hat: (B, T, C) logits; y: (B, T) int class ids (or (B, T, 1)).
    """
    y_hat = y_hat.astype(jnp.float32)
    if y.ndim == 3:
        y = y[..., 0]
    logp = jax.nn.log_softmax(y_hat, axis=-1)
    nll = -jnp.take_along_axis(logp, y[..., None].astype(jnp.int32),
                               axis=-1)  # (B, T, 1)
    if mask is None:
        return jnp.mean(nll)
    mask = mask.astype(jnp.float32)
    return jnp.sum(nll * mask) / jnp.sum(mask)


def masked_mol_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                    mask: Optional[jnp.ndarray] = None, *,
                    num_classes: int = 65536,
                    log_scale_min: float = -16.0) -> jnp.ndarray:
    """Masked discretized mixture-of-logistics NLL
    (reference: train.py:365-384)."""
    losses = discretized_mix_logistic_loss(
        y_hat, y, num_classes=num_classes, log_scale_min=log_scale_min,
        reduce=False)  # (B, T, 1)
    if mask is None:
        return jnp.mean(losses)
    mask = mask.astype(jnp.float32)
    return jnp.sum(losses * mask) / jnp.sum(mask)


def masked_gaussian_loss(y_hat: jnp.ndarray, y: jnp.ndarray,
                         mask: Optional[jnp.ndarray] = None, *,
                         log_scale_min: float = -16.0) -> jnp.ndarray:
    """Masked (mixture-of-)Gaussian NLL (reference: train.py:387-405)."""
    losses = mix_gaussian_loss(
        y_hat, y, log_scale_min=log_scale_min, reduce=False)  # (B, T, 1)
    if mask is None:
        return jnp.mean(losses)
    mask = mask.astype(jnp.float32)
    return jnp.sum(losses * mask) / jnp.sum(mask)
