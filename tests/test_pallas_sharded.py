"""Multi-chip pallas synthesis: utterances sharded over the mesh's data axis,
one independent fused kernel per device (SURVEY.md section 5.8; reference
batched synthesis: synthesis.py:42-64). Interpret mode on the 8-virtual-CPU
mesh; the same shard_map wrapper runs compiled on a real TPU slice.

Invariant: sharded pallas == single-device pallas == scan, elementwise, in
deterministic mode."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models.wavenet import WaveNetSpec, init_wavenet
from wavenet_vocoder_tpu.ops.generate import generate
from wavenet_vocoder_tpu.ops.pallas_generate import (
    PallasGenerator,
    generate_pallas,
)
from wavenet_vocoder_tpu.parallel import make_mesh


def _spec(**kw):
    base = dict(out_channels=256, layers=4, stacks=2, residual_channels=8,
                gate_channels=16, skip_out_channels=8, cin_channels=4,
                scalar_input=False)
    base.update(kw)
    return WaveNetSpec(**base)


def test_sharded_categorical_matches_single_device():
    spec = _spec()
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 8, 64
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4))

    single = np.asarray(generate_pallas(
        p, spec, jax.random.PRNGKey(2), c=c, weight_dtype=jnp.float32,
        chunk=16, deterministic=True, interpret=True))

    mesh = make_mesh({"data": -1})
    sharded = np.asarray(generate_pallas(
        p, spec, jax.random.PRNGKey(2), c=c, weight_dtype=jnp.float32,
        chunk=16, deterministic=True, interpret=True, mesh=mesh))
    np.testing.assert_array_equal(single, sharded)

    # and both agree with the scan engine
    codes_scan = np.argmax(np.asarray(
        generate(p, spec, jax.random.PRNGKey(2), c=c,
                 deterministic=True)["samples"]), -1)
    np.testing.assert_array_equal(codes_scan, sharded)


def test_sharded_mol_with_global_cond_matches_single_device():
    spec = _spec(out_channels=30, scalar_input=True,
                 output_distribution="Logistic", gin_channels=8,
                 use_speaker_embedding=True, n_speakers=3)
    p = init_wavenet(jax.random.PRNGKey(3), spec)
    B, T = 8, 32
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4))
    g = jnp.asarray([0, 1, 2, 0, 1, 2, 0, 1], dtype=jnp.int32)

    single = np.asarray(generate_pallas(
        p, spec, jax.random.PRNGKey(2), c=c, g=g, weight_dtype=jnp.float32,
        chunk=16, deterministic=True, interpret=True))
    mesh = make_mesh({"data": -1})
    sharded = np.asarray(generate_pallas(
        p, spec, jax.random.PRNGKey(2), c=c, g=g, weight_dtype=jnp.float32,
        chunk=16, deterministic=True, interpret=True, mesh=mesh))
    np.testing.assert_allclose(single, sharded, atol=1e-5)


def test_sharded_partial_data_axis():
    """A data axis smaller than the device count (e.g. data=4 of 8 devs)."""
    spec = _spec()
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 4, 32
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4))
    single = np.asarray(generate_pallas(
        p, spec, jax.random.PRNGKey(2), c=c, weight_dtype=jnp.float32,
        chunk=16, deterministic=True, interpret=True))
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])
    sharded = np.asarray(generate_pallas(
        p, spec, jax.random.PRNGKey(2), c=c, weight_dtype=jnp.float32,
        chunk=16, deterministic=True, interpret=True, mesh=mesh))
    np.testing.assert_array_equal(single, sharded)


def test_sharded_batch_not_divisible_raises():
    spec = _spec()
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    c = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 4))
    mesh = make_mesh({"data": -1})
    gen = PallasGenerator(p, spec, weight_dtype=jnp.float32, chunk=16,
                          mesh=mesh)
    with pytest.raises(ValueError, match="not divisible"):
        gen(jax.random.PRNGKey(2), c=c, deterministic=True, interpret=True)


def test_sharded_seeds_fold_in_axis_index(monkeypatch):
    """Non-deterministic mode must NOT reuse one PRNG stream on every
    device: the dispatch hands device i the seed ``base + i``. (The CPU
    mosaic emulator ignores prng_seed, so assert on the seed each device's
    kernel actually receives, via a stub that echoes it back.)"""
    from wavenet_vocoder_tpu.ops import pallas_generate as pg
    spec = _spec()
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 8, 32
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, 4))

    def echo_seed(packed, spec, *, T, c_up, g_gate, x0, seed, **kw):
        return jnp.full((x0.shape[0], T), seed[0], jnp.int32)

    mesh = make_mesh({"data": -1})
    gen = pg.PallasGenerator(p, spec, weight_dtype=jnp.float32, chunk=16,
                             mesh=mesh)
    monkeypatch.setattr(pg, "_pallas_generate_jit", echo_seed)
    out = np.asarray(gen(jax.random.PRNGKey(2), c=c, interpret=True))
    seeds = out[:, 0]
    base = seeds[0]
    np.testing.assert_array_equal(seeds, base + np.arange(B))


def test_batch_wavegen_pallas_mesh():
    """The synthesis-layer entry point: batch_wavegen(engine='pallas',
    mesh=...) must no longer raise, and must match the meshless call."""
    from wavenet_vocoder_tpu.synthesis import batch_wavegen
    cfg = Config(input_type="mulaw-quantize", quantize_channels=256,
                 out_channels=256, layers=4, stacks=2, residual_channels=8,
                 gate_channels=16, skip_out_channels=8, cin_channels=4,
                 upsample_conditional_features=False, cin_pad=0)
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    spec = spec_from_config(cfg)
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 8, 32
    c = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (B, T, 4)))

    wav_single = batch_wavegen(p, cfg, spec=spec, c=c, T=T,
                               rng=jax.random.PRNGKey(2), engine="pallas",
                               weight_dtype=jnp.float32, chunk=16,
                               deterministic=True, interpret=True)
    mesh = make_mesh({"data": -1})
    wav_mesh = batch_wavegen(p, cfg, spec=spec, c=c, T=T,
                             rng=jax.random.PRNGKey(2), engine="pallas",
                             mesh=mesh, weight_dtype=jnp.float32, chunk=16,
                             deterministic=True, interpret=True)
    np.testing.assert_array_equal(wav_single, wav_mesh)
