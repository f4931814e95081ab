"""Synthesis library tests (reference: synthesis.py:42-188 behaviors)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models.wavenet import init_wavenet, spec_from_config
from wavenet_vocoder_tpu.synthesis import (
    batch_wavegen,
    pad_mel_context,
    wavegen,
)

TINY = dict(layers=2, stacks=1, residual_channels=8, gate_channels=8,
            skip_out_channels=8, cin_channels=5, cin_pad=1,
            upsample_conditional_features=True,
            upsample_params={"upsample_scales": [2, 2]}, hop_size=4,
            compute_dtype="")


def _setup(**kw):
    cfg = Config(**{**TINY, **kw})
    spec = spec_from_config(cfg)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    return cfg, spec, params


def test_pad_mel_context():
    c = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
    out = pad_mel_context(c, 2)
    assert out.shape == (1, 8, 3)
    np.testing.assert_array_equal(out[0, 0], c[0, 0])
    np.testing.assert_array_equal(out[0, 1], c[0, 0])
    np.testing.assert_array_equal(out[0, -1], c[0, -1])


def test_batch_wavegen_mulaw_quantize():
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256)
    B, Tmel = 2, 10
    c = np.random.RandomState(0).randn(B, Tmel, 5).astype(np.float32)
    wav = batch_wavegen(params, cfg, spec=spec, c=c,
                        rng=jax.random.PRNGKey(1))
    T = (Tmel - 2 * cfg.cin_pad) * cfg.hop_size
    assert wav.shape == (B, T)
    assert wav.dtype == np.float32
    assert np.abs(wav).max() <= 1.0


@pytest.mark.parametrize("dist,out_ch", [("Logistic", 30), ("Normal", 2)])
def test_batch_wavegen_scalar(dist, out_ch):
    cfg, spec, params = _setup(input_type="raw", out_channels=out_ch,
                               output_distribution=dist,
                               quantize_channels=65536)
    B, Tmel = 2, 8
    c = np.random.RandomState(1).randn(B, Tmel, 5).astype(np.float32)
    wav = batch_wavegen(params, cfg, spec=spec, c=c,
                        rng=jax.random.PRNGKey(2))
    assert wav.shape == (B, (Tmel - 2) * 4)
    assert np.abs(wav).max() <= 1.0


def test_gain_and_postprocess_applied():
    cfg, spec, params = _setup(input_type="raw", out_channels=30,
                               global_gain_scale=0.5)
    B, Tmel = 1, 8
    c = np.random.RandomState(2).randn(B, Tmel, 5).astype(np.float32)
    w1 = batch_wavegen(params, cfg, spec=spec, c=c, rng=jax.random.PRNGKey(3))
    cfg2 = cfg.replace(global_gain_scale=1.0)
    w2 = batch_wavegen(params, cfg2, spec=spec, c=c, rng=jax.random.PRNGKey(3))
    # same samples, different gain unscale (reference: synthesis.py:83-86)
    np.testing.assert_allclose(w1, w2 * 2.0, atol=1e-5)


def test_wavegen_single_utterance():
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256)
    Tmel = 10
    c = np.random.RandomState(3).randn(Tmel, 5).astype(np.float32)
    wav = wavegen(params, cfg, spec=spec, c=c, rng=jax.random.PRNGKey(4))
    # cin_pad is added internally -> full Tmel*hop samples out
    assert wav.shape == (Tmel * cfg.hop_size,)


def test_wavegen_feature_repeat_path():
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256,
                               upsample_conditional_features=False, cin_pad=0)
    Tframes = 6
    c = np.random.RandomState(4).randn(Tframes, 5).astype(np.float32)
    wav = wavegen(params, cfg, spec=spec, c=c, rng=jax.random.PRNGKey(5))
    # features repeated hop times (reference: synthesis.py:128-146)
    assert wav.shape == (Tframes * cfg.hop_size,)


def test_synthesizer_scan_engine():
    # pack-once serving wrapper (pallas needs TPU; scan path tested here)
    from wavenet_vocoder_tpu.synthesis import Synthesizer
    import jax
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256)
    syn = Synthesizer(params, cfg, spec=spec, engine="scan")
    B, Tmel = 2, 6
    c = np.random.RandomState(0).randn(B, Tmel, 5).astype(np.float32)
    wav = syn(c, rng=jax.random.PRNGKey(0))
    # pad_context adds cin_pad internally -> full Tmel*hop samples
    assert wav.shape == (B, Tmel * cfg.hop_size)
    # deterministic per key; distinct keys differ
    wav2 = syn(c, rng=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(wav, wav2)
    wav3 = syn(c, rng=jax.random.PRNGKey(1))
    assert not np.array_equal(wav, wav3)
