"""Mixture-head math tests, mirroring the reference's strategy
(reference: tests/test_mixture.py) — shape/reduce contracts, sampler
behavior, and algebraic identities of the numerically-stable formulations."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_vocoder_tpu.ops.mixture import (
    discretized_mix_logistic_loss,
    log_softmax,
    log_sum_exp,
    mix_gaussian_loss,
    sample_from_discretized_mix_logistic,
    sample_from_mix_gaussian,
)


def _fake_params(B=2, T=64, nr_mix=10, seed=0):
    rng = np.random.RandomState(seed)
    y_hat = rng.randn(B, T, 3 * nr_mix).astype(np.float32)
    y = rng.uniform(-0.9, 0.9, (B, T, 1)).astype(np.float32)
    return jnp.asarray(y_hat), jnp.asarray(y)


def test_log_softmax_matches_jax():
    # (reference: tests/test_mixture.py:28-36)
    x = jnp.asarray(np.random.RandomState(1).randn(4, 16).astype(np.float32) * 10)
    np.testing.assert_allclose(
        np.asarray(log_softmax(x)), np.asarray(jax.nn.log_softmax(x, axis=-1)),
        atol=1e-5)


def test_log_sum_exp_identity():
    x = jnp.asarray(np.random.RandomState(2).randn(3, 7).astype(np.float32) * 30)
    expected = np.log(np.sum(np.exp(np.asarray(x, dtype=np.float64)), axis=-1))
    np.testing.assert_allclose(np.asarray(log_sum_exp(x)), expected, rtol=1e-5)


@pytest.mark.parametrize("num_classes", [256, 65536])
def test_mol_loss_shapes_and_reduce(num_classes):
    # (reference: tests/test_mixture.py:40-60 contract)
    y_hat, y = _fake_params()
    per_elem = discretized_mix_logistic_loss(
        y_hat, y, num_classes=num_classes, reduce=False)
    assert per_elem.shape == (2, 64, 1)
    total = discretized_mix_logistic_loss(
        y_hat, y, num_classes=num_classes, reduce=True)
    np.testing.assert_allclose(float(total), float(jnp.sum(per_elem)), rtol=1e-6)
    assert np.isfinite(float(total))


def test_mol_loss_edge_targets_finite():
    # +/-1 targets exercise the 0.999 edge cases (reference: mixture.py:96-99)
    y_hat, _ = _fake_params()
    for v in (-1.0, 1.0):
        y = jnp.full((2, 64, 1), v, dtype=jnp.float32)
        loss = discretized_mix_logistic_loss(y_hat, y, reduce=True)
        assert np.isfinite(float(loss))


def test_mol_loss_tiny_scale_fallback_finite():
    # force cdf_delta <= 1e-5 to exercise the midpoint-pdf fallback
    # (reference: mixture.py:89-95)
    B, T, nr_mix = 1, 8, 2
    y_hat = np.zeros((B, T, 3 * nr_mix), dtype=np.float32)
    y_hat[..., 2 * nr_mix:] = -30.0  # log_scale far below clamp... clamped to min
    y = np.full((B, T, 1), 0.5, dtype=np.float32)
    loss = discretized_mix_logistic_loss(
        jnp.asarray(y_hat), jnp.asarray(y), num_classes=65536,
        log_scale_min=-32.0, reduce=True)
    assert np.isfinite(float(loss))


def test_mol_loss_against_naive_float64():
    """Stable formulation == naive direct formula, computed in f64
    (mirrors reference algebraic-identity checks,
    tests/test_mixture.py:89-109)."""
    B, T, nr_mix, num_classes = 2, 32, 3, 256
    rs = np.random.RandomState(3)
    y_hat = rs.randn(B, T, 3 * nr_mix).astype(np.float64)
    y = rs.uniform(-0.9, 0.9, (B, T, 1)).astype(np.float64)

    logit_probs = y_hat[..., :nr_mix]
    means = y_hat[..., nr_mix:2 * nr_mix]
    log_scales = np.maximum(y_hat[..., 2 * nr_mix:], -7.0)
    yb = np.broadcast_to(y, means.shape)

    def sigmoid(v):
        return 1.0 / (1.0 + np.exp(-v))

    inv = np.exp(-log_scales)
    cdf_plus = sigmoid(inv * (yb - means + 1.0 / (num_classes - 1)))
    cdf_min = sigmoid(inv * (yb - means - 1.0 / (num_classes - 1)))
    probs = np.maximum(cdf_plus - cdf_min, 1e-12)
    w = np.exp(logit_probs - logit_probs.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    naive = -np.log(np.sum(w * probs, axis=-1))[..., None]

    ours = np.asarray(discretized_mix_logistic_loss(
        jnp.asarray(y_hat, dtype=jnp.float32), jnp.asarray(y, dtype=jnp.float32),
        num_classes=num_classes, reduce=False))
    np.testing.assert_allclose(ours, naive, atol=1e-4)


def test_mol_sampler_deterministic_and_in_range():
    y_hat, _ = _fake_params()
    key = jax.random.PRNGKey(0)
    s1 = sample_from_discretized_mix_logistic(key, y_hat)
    s2 = sample_from_discretized_mix_logistic(key, y_hat)
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert s1.shape == (2, 64)
    assert float(jnp.max(jnp.abs(s1))) <= 1.0
    s3 = sample_from_discretized_mix_logistic(jax.random.PRNGKey(1), y_hat)
    assert not np.array_equal(np.asarray(s1), np.asarray(s3))


def test_mol_sampler_peaked_mixture_tracks_mean():
    # A near-deterministic mixture: huge logit on component 0,
    # mean 0.3, tiny scale -> samples concentrate near 0.3.
    B, T, nr_mix = 4, 128, 5
    y_hat = np.zeros((B, T, 3 * nr_mix), dtype=np.float32)
    y_hat[..., 0] = 50.0          # select comp 0
    y_hat[..., nr_mix] = 0.3      # its mean
    y_hat[..., 2 * nr_mix] = -9.0  # its log scale
    s = sample_from_discretized_mix_logistic(
        jax.random.PRNGKey(2), jnp.asarray(y_hat))
    assert abs(float(jnp.mean(s)) - 0.3) < 5e-3


def test_gaussian_loss_single_vs_reference_formula():
    # C == 2 single-Gaussian packing (reference: mixture.py:187-191)
    B, T = 2, 32
    rs = np.random.RandomState(5)
    y_hat = rs.randn(B, T, 2).astype(np.float32)
    y = rs.uniform(-0.9, 0.9, (B, T, 1)).astype(np.float32)
    per = np.asarray(mix_gaussian_loss(
        jnp.asarray(y_hat), jnp.asarray(y), reduce=False))
    assert per.shape == (B, T, 1)
    mean, log_s = y_hat[..., 0:1], np.maximum(y_hat[..., 1:2], -7.0)
    expected = -( -0.5 * np.exp(-2 * log_s) * (y - mean) ** 2
                  - log_s - 0.5 * np.log(2 * np.pi))
    np.testing.assert_allclose(per, expected, atol=1e-5)


def test_gaussian_mixture_loss_shapes():
    y_hat, y = _fake_params(nr_mix=4)
    per = mix_gaussian_loss(y_hat[..., :12], y, reduce=False)
    assert per.shape == (2, 64, 1)
    tot = mix_gaussian_loss(y_hat[..., :12], y, reduce=True)
    np.testing.assert_allclose(float(tot), float(jnp.sum(per)), rtol=1e-6)


def test_gaussian_sampler_variants():
    key = jax.random.PRNGKey(3)
    B, T = 2, 256
    # single gaussian C=2: mean 0.2, log_scale -6
    y2 = np.zeros((B, T, 2), dtype=np.float32)
    y2[..., 0] = 0.2
    y2[..., 1] = -6.0
    s = sample_from_mix_gaussian(key, jnp.asarray(y2))
    assert s.shape == (B, T)
    assert abs(float(jnp.mean(s)) - 0.2) < 1e-2
    # C=3 packing [logit, mean, log_scale] (reference: mixture.py:260-261)
    y3 = np.zeros((B, T, 3), dtype=np.float32)
    y3[..., 1] = -0.4
    y3[..., 2] = -6.0
    s3 = sample_from_mix_gaussian(key, jnp.asarray(y3))
    assert abs(float(jnp.mean(s3)) + 0.4) < 1e-2
