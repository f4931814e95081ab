"""Model tests — the load-bearing strategy mirrors the reference
(reference: tests/test_model.py): for every conditioning combination, the
batch forward must equal teacher-forced scan generation (the reference's
central invariant, test_model.py:173-174 — enforced here as HARD failures at
a tighter tolerance).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wavenet_vocoder_tpu import (
    Config,
    WaveNetSpec,
    apply_wavenet,
    init_wavenet,
    make_generation_fast,
    receptive_field_size,
    spec_from_config,
)
from wavenet_vocoder_tpu.ops.generate import generate

ATOL = 1e-4  # reference tolerance (test_model.py:173-174); we typically hit 1e-6


def compact_spec(**kw):
    """Tiny model factory (reference: tests/test_model.py:23-25)."""
    base = dict(out_channels=256, layers=4, stacks=2, residual_channels=32,
                gate_channels=32, skip_out_channels=32, kernel_size=3,
                cin_channels=-1, gin_channels=-1, scalar_input=False,
                upsample_conditional_features=False, dropout=0.0)
    base.update(kw)
    return WaveNetSpec(**base)


def _data(B=2, T=100, C=256, seed=0, scalar=False):
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    if scalar:
        x = jax.random.uniform(k1, (B, T, 1), minval=-0.9, maxval=0.9)
    else:
        ids = jax.random.randint(k1, (B, T), 0, C)
        x = jax.nn.one_hot(ids, C)
    c = jax.random.normal(k2, (B, T, 1))
    return x, c


def _assert_equiv(spec, params, x, c=None, g=None):
    if spec.scalar_input:
        y_off = apply_wavenet(params, spec, x, c=c, g=g)
        out = generate(params, spec, jax.random.PRNGKey(0), test_inputs=x,
                       c=c, g=g, output="logits")
        y_on = out["logits"]
    else:
        y_off = apply_wavenet(params, spec, x, c=c, g=g, softmax=True)
        out = generate(params, spec, jax.random.PRNGKey(0), test_inputs=x,
                       c=c, g=g, softmax=True, quantize=False,
                       output="samples")
        y_on = out["samples"]
    assert y_on.shape == y_off.shape
    np.testing.assert_allclose(np.asarray(y_off), np.asarray(y_on), atol=ATOL)


def test_receptive_field():
    # (reference: tests/test_misc.py:7-13, Parallel WaveNet Table 4)
    assert receptive_field_size(30, 3, 3) == 6139
    assert receptive_field_size(24, 4, 3) == 505
    assert receptive_field_size(16, 2, 3) == 1021


def test_forward_shapes():
    spec = compact_spec()
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    x, _ = _data()
    y = apply_wavenet(p, spec, x)
    assert y.shape == (2, 100, 256)
    assert y.dtype == jnp.float32


def test_unconditioned_equivalence():
    # (reference: test_model.py:148-177 "none" case)
    spec = compact_spec()
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    x, _ = _data()
    _assert_equiv(spec, p, x)


def test_local_conditioning_equivalence():
    # (reference: test_model.py test_local_conditioning_correctness)
    spec = compact_spec(cin_channels=1)
    p = init_wavenet(jax.random.PRNGKey(1), spec)
    x, c = _data()
    _assert_equiv(spec, p, x, c=c)


def test_local_conditioning_upsample_equivalence():
    # (reference: test_model.py test_local_conditioning_upsample_correctness)
    spec = compact_spec(cin_channels=1, upsample_conditional_features=True,
                        upsample_net="UpsampleNetwork",
                        upsample_scales=(2, 2), cin_pad=0)
    p = init_wavenet(jax.random.PRNGKey(2), spec)
    x, c = _data(T=96)
    c_down = c[:, ::4, :]  # (B, 24, 1); upsamples back to 96
    _assert_equiv(spec, p, x, c=c_down)


def test_conv_in_upsample_with_cin_pad_equivalence():
    # ConvInUpsampleNetwork consumes cin_pad frames each side
    # (reference: upsample.py:77-85; train.py:417-418 length arithmetic)
    cin_pad = 2
    spec = compact_spec(cin_channels=4, upsample_conditional_features=True,
                        upsample_net="ConvInUpsampleNetwork",
                        upsample_scales=(2, 2), cin_pad=cin_pad)
    p = init_wavenet(jax.random.PRNGKey(3), spec)
    Tmel = 30
    hop = 4
    T = (Tmel - 2 * cin_pad) * hop
    x, _ = _data(T=T)
    c = jax.random.normal(jax.random.PRNGKey(7), (2, Tmel, 4))
    _assert_equiv(spec, p, x, c=c)


def test_global_embedding_equivalence():
    # (reference: test_model.py global-conditioning cases)
    spec = compact_spec(gin_channels=16, use_speaker_embedding=True,
                        n_speakers=4)
    p = init_wavenet(jax.random.PRNGKey(4), spec)
    x, _ = _data()
    g = jnp.asarray([0, 3], dtype=jnp.int32)
    _assert_equiv(spec, p, x, g=g)


def test_global_continuous_equivalence():
    spec = compact_spec(gin_channels=16, use_speaker_embedding=False)
    p = init_wavenet(jax.random.PRNGKey(5), spec)
    x, _ = _data()
    g = jax.random.normal(jax.random.PRNGKey(8), (2, 16))
    _assert_equiv(spec, p, x, g=g)


def test_local_and_global_equivalence():
    spec = compact_spec(cin_channels=1, gin_channels=16,
                        use_speaker_embedding=True, n_speakers=4)
    p = init_wavenet(jax.random.PRNGKey(6), spec)
    x, c = _data()
    g = jnp.asarray([1, 2], dtype=jnp.int32)
    _assert_equiv(spec, p, x, c=c, g=g)


def test_scalar_input_mol_equivalence():
    # (reference: test_model.py:110-143 mixture wavenet)
    spec = compact_spec(out_channels=30, scalar_input=True, cin_channels=1,
                        output_distribution="Logistic")
    p = init_wavenet(jax.random.PRNGKey(7), spec)
    x, c = _data(scalar=True)
    _assert_equiv(spec, p, x, c=c)


def test_scalar_input_gaussian_equivalence():
    spec = compact_spec(out_channels=2, scalar_input=True, cin_channels=1,
                        output_distribution="Normal")
    p = init_wavenet(jax.random.PRNGKey(8), spec)
    x, c = _data(scalar=True)
    _assert_equiv(spec, p, x, c=c)


def test_weight_norm_fold_preserves_forward():
    # make_generation_fast must not change outputs
    # (reference: wavenet.py:355-361)
    spec = compact_spec(cin_channels=1)
    p = init_wavenet(jax.random.PRNGKey(9), spec)
    x, c = _data()
    y1 = apply_wavenet(p, spec, x, c=c)
    y2 = apply_wavenet(make_generation_fast(p), spec, x, c=c)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-5)


def test_spec_from_config():
    cfg = Config()
    spec = spec_from_config(cfg)
    assert spec.layers == 24 and spec.stacks == 4
    assert spec.scalar_input  # raw input
    assert spec.dilations[:7] == (1, 2, 4, 8, 16, 32, 1)
    assert spec.receptive_field == 505


def test_free_running_generation():
    spec = compact_spec(layers=2, stacks=1, residual_channels=16,
                        gate_channels=16, skip_out_channels=16)
    p = init_wavenet(jax.random.PRNGKey(10), spec)
    out = generate(p, spec, jax.random.PRNGKey(0), T=40, output="samples")
    s = out["samples"]
    assert s.shape == (1, 40, 256)
    # one-hot rows
    np.testing.assert_allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-6)
    # deterministic under the same key
    s2 = generate(p, spec, jax.random.PRNGKey(0), T=40)["samples"]
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s2))
