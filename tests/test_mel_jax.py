"""On-device mel extraction parity vs the host numpy pipeline.

The host path (dsp/audio.py:logmelspectrogram) is itself parity-tested
against the reference's librosa conventions; here we pin the XLA matmul-DFT
path and the fused Pallas kernel (interpret mode on CPU) to it.
"""
import numpy as np
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.dsp import audio
from wavenet_vocoder_tpu.dsp.mel_jax import (logmelspectrogram_jax,
                                             logmelspectrogram_pallas)


def _sig(T, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(T) / 22050.0
    x = (0.5 * np.sin(2 * np.pi * 440 * t)
         + 0.2 * np.sin(2 * np.pi * 1330 * t)
         + 0.05 * rng.randn(T))
    return x.astype(np.float32)


@pytest.fixture(scope="module")
def cfg():
    return Config()


def test_xla_matches_host(cfg):
    x = _sig(22050)
    ref = audio.logmelspectrogram(x, cfg)
    got = np.asarray(logmelspectrogram_jax(x, cfg))
    assert got.shape == ref.shape
    # host path computes in f64; log10 compresses, so 1e-3 is tight enough
    # to catch any windowing/framing/filterbank mistake
    assert np.max(np.abs(got - ref)) < 2e-3, np.max(np.abs(got - ref))


def test_xla_batched(cfg):
    x = np.stack([_sig(8192, 0), _sig(8192, 1)])
    got = np.asarray(logmelspectrogram_jax(x, cfg))
    ref0 = audio.logmelspectrogram(x[0], cfg)
    assert got.shape == (2,) + ref0.shape
    assert np.max(np.abs(got[0] - ref0)) < 2e-3


def test_pallas_matches_host(cfg):
    x = _sig(22050, seed=3)
    ref = audio.logmelspectrogram(x, cfg)
    got = np.asarray(logmelspectrogram_pallas(x, cfg, f_blk=16,
                                              interpret=True))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-3, np.max(np.abs(got - ref))


def test_pallas_short_signal(cfg):
    # shorter than one frame block; exercises the frame/pad tail
    x = _sig(3000, seed=4)
    ref = audio.logmelspectrogram(x, cfg)
    got = np.asarray(logmelspectrogram_pallas(x, cfg, f_blk=16,
                                              interpret=True))
    assert got.shape == ref.shape
    assert np.max(np.abs(got - ref)) < 2e-3


def test_win_length_shorter_than_fft(cfg):
    c = Config(win_length=800)
    x = _sig(12000, seed=5)
    ref = audio.logmelspectrogram(x, c)
    got = np.asarray(logmelspectrogram_jax(x, c))
    assert np.max(np.abs(got - ref)) < 2e-3
