"""Streaming synthesis == offline synthesis, elementwise.

The stream (wavenet_vocoder_tpu/streaming.py) must reproduce
``batch_wavegen`` on the full mel exactly: same decoder state evolution
(absolute-step ring indices + RNG), same upsample-window math at chunk
boundaries, same IIR decode state. The reference has no streaming mode at
all (its incremental_forward requires the full conditioning up front,
reference: wavenet.py:215-343) — this is TPU-build-only surface, so the test
oracle is our own offline path."""
import numpy as np
import jax
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models.wavenet import init_wavenet, spec_from_config
from wavenet_vocoder_tpu.streaming import StreamingSynthesizer
from wavenet_vocoder_tpu.synthesis import batch_wavegen, pad_mel_context

TINY = dict(layers=4, stacks=2, residual_channels=8, gate_channels=16,
            skip_out_channels=8, cin_channels=5, cin_pad=1,
            upsample_conditional_features=True,
            upsample_params={"upsample_scales": [2, 2]}, hop_size=4,
            compute_dtype="")


def _setup(**kw):
    cfg = Config(**{**TINY, **kw})
    spec = spec_from_config(cfg)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    return cfg, spec, params


def _offline(params, cfg, mel, rng):
    return batch_wavegen(params, cfg, c=pad_mel_context(mel, cfg.cin_pad),
                         rng=rng)


def _stream(params, cfg, mel, rng, chunks, batch):
    s = StreamingSynthesizer(params, cfg, rng=rng, batch=batch)
    outs, i = [], 0
    for n in chunks:
        outs.append(s.feed(mel[:, i:i + n]))
        i += n
    assert i == mel.shape[1], "chunk plan must cover the mel"
    outs.append(s.flush())
    return np.concatenate(outs, axis=1), s


@pytest.mark.parametrize("chunks", [[12], [3, 4, 5], [1] * 12, [6, 6]])
def test_stream_equals_offline_mol(chunks):
    cfg, spec, params = _setup(input_type="raw", out_channels=30,
                               output_distribution="Logistic",
                               quantize_channels=65536)
    mel = np.random.RandomState(0).randn(2, 12, 5).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    ref = _offline(params, cfg, mel, rng)
    got, s = _stream(params, cfg, mel, rng, chunks, batch=2)
    assert got.shape == ref.shape == (2, 12 * cfg.hop_size)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)
    assert s.lookahead_frames == cfg.cin_pad + 2  # 2 upsample scales


def test_stream_equals_offline_mulaw_sampled():
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256)
    mel = np.random.RandomState(1).randn(1, 10, 5).astype(np.float32)
    rng = jax.random.PRNGKey(3)
    ref = _offline(params, cfg, mel, rng)
    got, _ = _stream(params, cfg, mel, rng, [4, 3, 3], batch=1)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_stream_preemphasis_iir_state():
    cfg, spec, params = _setup(input_type="raw", out_channels=30,
                               output_distribution="Logistic",
                               quantize_channels=65536,
                               postprocess="inv_preemphasis",
                               global_gain_scale=0.55)
    mel = np.random.RandomState(2).randn(1, 9, 5).astype(np.float32)
    rng = jax.random.PRNGKey(11)
    ref = _offline(params, cfg, mel, rng)
    got, _ = _stream(params, cfg, mel, rng, [2, 2, 2, 3], batch=1)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_stream_no_upsample_feature_repeat():
    cfg, spec, params = _setup(upsample_conditional_features=False,
                               upsample_params={}, cin_pad=0,
                               input_type="raw", out_channels=30,
                               output_distribution="Logistic",
                               quantize_channels=65536)
    mel = np.random.RandomState(3).randn(1, 8, 5).astype(np.float32)
    rng = jax.random.PRNGKey(5)
    # offline no-upsample path: features repeated to sample rate
    rep = np.repeat(mel, cfg.hop_size, axis=1)
    ref = batch_wavegen(params, cfg, c=rep, T=rep.shape[1], rng=rng)
    s = StreamingSynthesizer(params, cfg, rng=rng, batch=1)
    assert s.lookahead_frames == 0
    got = np.concatenate([s.feed(mel[:, :5]), s.feed(mel[:, 5:]),
                          s.flush()], axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_stream_global_conditioning():
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256,
                               gin_channels=6, n_speakers=3,
                               use_speaker_embedding=True)
    mel = np.random.RandomState(4).randn(2, 8, 5).astype(np.float32)
    g = np.array([0, 2])
    rng = jax.random.PRNGKey(9)
    ref = batch_wavegen(params, cfg, c=pad_mel_context(mel, cfg.cin_pad),
                        g=g, rng=rng)
    s = StreamingSynthesizer(params, cfg, rng=rng, batch=2, g=g)
    got = np.concatenate([s.feed(mel[:, :4]), s.feed(mel[:, 4:]),
                          s.flush()], axis=1)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_stream_reset_and_finish_guard():
    cfg, spec, params = _setup(input_type="raw", out_channels=30,
                               quantize_channels=65536)
    mel = np.random.RandomState(5).randn(1, 6, 5).astype(np.float32)
    s = StreamingSynthesizer(params, cfg, rng=jax.random.PRNGKey(1), batch=1)
    s.feed(mel)
    s.flush()
    with pytest.raises(RuntimeError):
        s.feed(mel)
    s.reset()
    out = np.concatenate([s.feed(mel), s.flush()], axis=1)
    assert out.shape == (1, 6 * cfg.hop_size)


# ----------------------------------------------------------------------
# Streaming on the production (pallas) engine — ring state carried through
# the fused kernel (VERDICT r2 weak #6)
# ----------------------------------------------------------------------
def _stream_pallas(params, cfg, mel, rng, chunks, batch, **kw):
    s = StreamingSynthesizer(params, cfg, rng=rng, batch=batch,
                             engine="pallas", interpret=True, **kw)
    outs, i = [], 0
    for n in chunks:
        outs.append(s.feed(mel[:, i:i + n]))
        i += n
    outs.append(s.flush())
    return np.concatenate(outs, axis=1), s


def _offline_pallas(params, cfg, mel, rng, **kw):
    return batch_wavegen(params, cfg, c=pad_mel_context(mel, cfg.cin_pad),
                         rng=rng, engine="pallas", interpret=True,
                         weight_dtype=jax.numpy.float32, chunk=4, **kw)


@pytest.mark.parametrize("chunks", [[12], [3, 4, 5], [6, 6]])
def test_pallas_stream_equals_offline_pallas_mol(chunks):
    cfg, spec, params = _setup(input_type="raw", out_channels=30,
                               output_distribution="Logistic",
                               quantize_channels=65536)
    mel = np.random.RandomState(0).randn(2, 12, 5).astype(np.float32)
    rng = jax.random.PRNGKey(7)
    ref = _offline_pallas(params, cfg, mel, rng, deterministic=True)
    got, s = _stream_pallas(params, cfg, mel, rng, chunks, batch=2,
                            weight_dtype=jax.numpy.float32,
                            deterministic=True)
    assert got.shape == ref.shape == (2, 12 * cfg.hop_size)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=0)


def test_pallas_stream_categorical_deterministic():
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256)
    mel = np.random.RandomState(1).randn(1, 10, 5).astype(np.float32)
    rng = jax.random.PRNGKey(3)
    ref = _offline_pallas(params, cfg, mel, rng, deterministic=True)
    got, _ = _stream_pallas(params, cfg, mel, rng, [4, 3, 3], batch=1,
                            weight_dtype=jax.numpy.float32,
                            deterministic=True)
    np.testing.assert_allclose(got, ref, atol=1e-6, rtol=0)


def test_pallas_stream_segment_alignment_error():
    """Non-chunk-aligned segments must fail loudly, not corrupt state."""
    cfg, spec, params = _setup(input_type="mulaw-quantize",
                               quantize_channels=256, out_channels=256)
    from wavenet_vocoder_tpu.models.wavenet import init_wavenet
    from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
    import jax.numpy as jnp
    gen = PallasGenerator(params, spec, weight_dtype=jnp.float32, chunk=16)
    with pytest.raises(ValueError, match="multiples of the kernel chunk"):
        gen(jax.random.PRNGKey(0), T=24,
            c=None, initial_input=jnp.zeros((1, 256)), return_state=True,
            interpret=True)
