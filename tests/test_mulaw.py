"""Mu-law companding tests (conventions per reference usage:
datasets/wavallin.py:46, 82-84 — mu = quantize_channels - 1)."""
import numpy as np

from wavenet_vocoder_tpu.ops.mulaw import (
    inv_mulaw,
    inv_mulaw_quantize,
    mulaw,
    mulaw_quantize,
)


def test_mulaw_roundtrip():
    x = np.linspace(-1, 1, 1001).astype(np.float32)
    y = mulaw(x, 255)
    assert np.all(np.abs(y) <= 1.0 + 1e-7)
    x2 = inv_mulaw(y, 255)
    np.testing.assert_allclose(x, x2, atol=1e-5)


def test_mulaw_quantize_range():
    x = np.linspace(-1, 1, 10001).astype(np.float64)
    q = mulaw_quantize(x, 255)
    assert q.dtype == np.int32
    assert q.min() >= 0 and q.max() <= 255
    # zero maps to midpoint code 127 (the generation seed value,
    # reference: wavenet.py:286)
    assert mulaw_quantize(np.zeros(1), 255)[0] == 127


def test_mulaw_quantize_roundtrip_error_small():
    rng = np.random.RandomState(0)
    x = rng.uniform(-1, 1, 4096).astype(np.float64)
    q = mulaw_quantize(x, 255)
    x2 = inv_mulaw_quantize(q, 255)
    # 8-bit mu-law: truncating quantization -> worst-case error near |x|=1 is
    # one bin in the companded domain ~= 0.044 in x
    assert np.max(np.abs(x - x2)) < 0.06


def test_jax_numpy_agree():
    import jax.numpy as jnp
    x = np.linspace(-0.99, 0.99, 257).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(mulaw(jnp.asarray(x), 255)), mulaw(x, 255), atol=1e-6)
    q_np = mulaw_quantize(x, 255)
    q_jx = np.asarray(mulaw_quantize(jnp.asarray(x), 255))
    np.testing.assert_array_equal(q_np, q_jx)
