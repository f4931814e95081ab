"""Native C++ data-path library: parity with the numpy implementations and
availability of the auto-build."""
import numpy as np
import pytest

from wavenet_vocoder_tpu.data import native
import wavenet_vocoder_tpu.ops.mulaw as pymulaw


def test_native_builds_and_loads():
    assert native.available(), "native lib failed to build/load"


def test_onehot_parity():
    rs = np.random.RandomState(0)
    codes = rs.randint(0, 256, (4, 100)).astype(np.int32)
    got = native.onehot(codes, 256)
    ref = np.eye(256, dtype=np.float32)[codes]
    np.testing.assert_array_equal(got, ref)


def test_onehot_out_of_range():
    if not native.available():
        pytest.skip("no native lib")
    with pytest.raises(ValueError):
        native.onehot(np.asarray([[300]], dtype=np.int32), 256)


def test_mulaw_parity():
    x = np.linspace(-0.99, 0.99, 1000).astype(np.float32)
    np.testing.assert_allclose(native.mulaw(x, 255),
                               np.asarray(pymulaw.mulaw(x, 255)), atol=1e-5)
    np.testing.assert_allclose(native.inv_mulaw(native.mulaw(x, 255), 255),
                               x, atol=1e-4)


def test_mulaw_quantize_parity():
    rs = np.random.RandomState(1)
    x = rs.uniform(-1, 1, 5000).astype(np.float32)
    got = native.mulaw_quantize(x, 255)
    ref = np.asarray(pymulaw.mulaw_quantize(x, 255))
    # float rounding at bin edges may differ by 1 code for a few samples
    assert np.mean(got == ref) > 0.999
    assert np.max(np.abs(got - ref)) <= 1


def test_inv_mulaw_quantize_parity():
    codes = np.arange(256, dtype=np.int32)
    got = native.inv_mulaw_quantize(codes, 255)
    ref = np.asarray(pymulaw.inv_mulaw_quantize(codes, 255))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_crop_onehot_batch():
    rs = np.random.RandomState(2)
    arrays = [rs.randint(0, 256, (n,)).astype(np.int32)
              for n in (500, 700, 600)]
    starts = [10, 200, 0]
    x, y = native.crop_onehot_batch(arrays, starts, 256, 256)
    assert x.shape == (3, 256, 256) and y.shape == (3, 256)
    for b in range(3):
        np.testing.assert_array_equal(
            y[b], arrays[b][starts[b]:starts[b] + 256])
    np.testing.assert_array_equal(x.argmax(-1), y)
    np.testing.assert_allclose(x.sum(-1), 1.0)
