"""Output-head distributions: discretized mixture of logistics (MoL),
(mixture of) Gaussian — losses and samplers, pure JAX.

Behavioral parity with reference ``wavenet_vocoder/mixture.py`` (pixel-cnn++
family math), re-derived for TPU:

  * Layout is channels-LAST throughout: ``y_hat (B, T, C)``, ``y (B, T, 1)``
    (the reference uses (B, C, T) and transposes internally,
    reference: mixture.py:48, 134).
  * All head math runs in float32 regardless of the conv stack's compute dtype
    — the ``cdf_delta <= 1e-5`` midpoint fallback and the +/-0.999 edge cases
    (reference: mixture.py:89-99) are meaningless in bf16 at
    quantize_channels=65536.
  * Samplers take explicit ``jax.random`` keys (reference uses stateful
    ``uniform_``/``Normal.sample``, mixture.py:138, 151, 267), making
    generation deterministic under a fixed key — the property the
    scan-based decoder relies on.

Parameter packing along the channel axis: ``[logit_probs, means, log_scales]``
each of width nr_mix (reference: mixture.py:51-53); the 2-channel single
Gaussian packs ``[mean, log_scale]`` (ClariNet teacher,
reference: mixture.py:187-191).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def log_sum_exp(x, axis: int = -1):
    """Numerically stable logsumexp (reference: mixture.py:17-23)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis))


def log_softmax(x, axis: int = -1):
    """Stable log-softmax."""
    shifted = x - jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=axis, keepdims=True))


def _softplus(x):
    return jax.nn.softplus(x)


def discretized_mix_logistic_loss(y_hat, y, num_classes: int = 256,
                                  log_scale_min: float = -7.0,
                                  reduce: bool = True):
    """Discretized mixture-of-logistics negative log-likelihood.

    Args:
      y_hat: (B, T, 3*nr_mix) predicted parameters (channels-last).
      y: (B, T, 1) target in [-1, 1].
      num_classes: quantization levels (256 or 65536).
      log_scale_min: clamp floor for log scales (reference: mixture.py:53).
      reduce: if True, return the scalar sum; else per-element (B, T, 1)
        (reference: mixture.py:103-106).
    """
    C = y_hat.shape[-1]
    assert C % 3 == 0
    nr_mix = C // 3

    y_hat = y_hat.astype(jnp.float32)
    y = y.astype(jnp.float32)

    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:3 * nr_mix], log_scale_min)

    # (B, T, 1) -> (B, T, nr_mix)
    y = jnp.broadcast_to(y, means.shape)

    centered_y = y - means
    inv_stdv = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_stdv * (centered_y + half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered_y - half_bin)
    cdf_min = jax.nn.sigmoid(min_in)

    # log P(y = min bin): log sigmoid(plus_in)
    log_cdf_plus = plus_in - _softplus(plus_in)
    # log P(y = max bin): log(1 - sigmoid(min_in))
    log_one_minus_cdf_min = -_softplus(min_in)

    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered_y
    # log pdf at bin center, fallback for vanishing cdf_delta
    log_pdf_mid = mid_in - log_scales - 2.0 * _softplus(mid_in)

    # select per reference: mixture.py:91-99
    log_probs = jnp.where(
        y < -0.999, log_cdf_plus,
        jnp.where(
            y > 0.999, log_one_minus_cdf_min,
            jnp.where(cdf_delta > 1e-5,
                      jnp.log(jnp.maximum(cdf_delta, 1e-12)),
                      log_pdf_mid - math.log((num_classes - 1) / 2.0))))

    log_probs = log_probs + log_softmax(logit_probs, axis=-1)

    nll = -log_sum_exp(log_probs, axis=-1)
    if reduce:
        return jnp.sum(nll)
    return nll[..., None]


def sample_from_discretized_mix_logistic(rng, y, log_scale_min: float = -7.0,
                                         clamp_log_scale: bool = False):
    """Draw a sample in [-1, 1] from MoL parameters.

    Args:
      rng: jax PRNG key.
      y: (..., 3*nr_mix) parameters, channels-last.
    Gumbel-max mixture selection + logistic inverse-CDF
    (reference: mixture.py:138-155).
    """
    C = y.shape[-1]
    assert C % 3 == 0
    nr_mix = C // 3
    y = y.astype(jnp.float32)

    logit_probs = y[..., :nr_mix]
    k_sel, k_u = jax.random.split(rng)

    # Gumbel-max over mixture logits (reference: mixture.py:138-140)
    u_sel = jax.random.uniform(k_sel, logit_probs.shape,
                               minval=1e-5, maxval=1.0 - 1e-5)
    argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(u_sel)), axis=-1)
    one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=jnp.float32)

    means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
    log_scales = jnp.sum(y[..., 2 * nr_mix:3 * nr_mix] * one_hot, axis=-1)
    if clamp_log_scale:
        log_scales = jnp.maximum(log_scales, log_scale_min)

    # logistic inverse-CDF (reference: mixture.py:151-152)
    u = jax.random.uniform(k_u, means.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = means + jnp.exp(log_scales) * (jnp.log(u) - jnp.log(1.0 - u))
    return jnp.clip(x, -1.0, 1.0)


_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)


def mix_gaussian_loss(y_hat, y, log_scale_min: float = -7.0,
                      reduce: bool = True):
    """Continuous (mixture-of-)Gaussian negative log-likelihood
    (ClariNet-style; reference: mixture.py:161-218).

    Args:
      y_hat: (B, T, C); C == 2 means single Gaussian ``[mean, log_scale]``,
        otherwise C = 3*nr_mix packed like MoL.
      y: (B, T, 1) target in [-1, 1].
    """
    C = y_hat.shape[-1]
    y_hat = y_hat.astype(jnp.float32)
    y = y.astype(jnp.float32)

    if C == 2:
        nr_mix = 1
        logit_probs = None
        means = y_hat[..., 0:1]
        log_scales = jnp.maximum(y_hat[..., 1:2], log_scale_min)
    else:
        assert C % 3 == 0
        nr_mix = C // 3
        logit_probs = y_hat[..., :nr_mix]
        means = y_hat[..., nr_mix:2 * nr_mix]
        log_scales = jnp.maximum(y_hat[..., 2 * nr_mix:3 * nr_mix], log_scale_min)

    y = jnp.broadcast_to(y, means.shape)
    centered_y = y - means
    # Normal(0, exp(log_scales)).log_prob(centered_y)
    log_probs = (-0.5 * jnp.exp(-2.0 * log_scales) * centered_y ** 2
                 - log_scales - _HALF_LOG_2PI)

    if nr_mix > 1:
        log_probs = log_probs + log_softmax(logit_probs, axis=-1)
        nll = -log_sum_exp(log_probs, axis=-1)[..., None]
    else:
        nll = -log_probs

    if reduce:
        return jnp.sum(nll)
    return nll


def sample_from_mix_gaussian(rng, y, log_scale_min: float = -7.0):
    """Draw a sample in [-1, 1] from (mixture-of-)Gaussian parameters
    (reference: mixture.py:221-270).

    Args:
      rng: jax PRNG key.
      y: (..., C) parameters, channels-last; C==2 single Gaussian.
    """
    C = y.shape[-1]
    y = y.astype(jnp.float32)
    if C == 2:
        nr_mix = 1
    else:
        assert C % 3 == 0
        nr_mix = C // 3

    k_sel, k_n = jax.random.split(rng)
    if nr_mix > 1:
        logit_probs = y[..., :nr_mix]
        u_sel = jax.random.uniform(k_sel, logit_probs.shape,
                                   minval=1e-5, maxval=1.0 - 1e-5)
        argmax = jnp.argmax(logit_probs - jnp.log(-jnp.log(u_sel)), axis=-1)
        one_hot = jax.nn.one_hot(argmax, nr_mix, dtype=jnp.float32)
        means = jnp.sum(y[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
        log_scales = jnp.sum(y[..., 2 * nr_mix:3 * nr_mix] * one_hot, axis=-1)
    elif C == 2:
        means, log_scales = y[..., 0], y[..., 1]
    elif C == 3:
        means, log_scales = y[..., 1], y[..., 2]
    else:
        raise ValueError("shouldn't happen")

    x = means + jnp.exp(log_scales) * jax.random.normal(k_n, means.shape)
    return jnp.clip(x, -1.0, 1.0)
