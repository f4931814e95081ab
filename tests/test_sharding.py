"""Multi-device tests on a virtual 8-device CPU mesh — the coverage the
reference lacks entirely (SURVEY.md section 4: 'Distributed testing: none').

Invariant: sharded training/synthesis must be numerically equivalent to
single-device execution."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.ops.generate import generate
from wavenet_vocoder_tpu.parallel import (
    data_parallel_batch_size,
    make_mesh,
    shard_batch,
    shard_state,
)
from wavenet_vocoder_tpu.training.train_state import (
    create_train_state,
    make_train_step,
)

TINY = dict(input_type="mulaw-quantize", quantize_channels=256,
            out_channels=256, layers=2, stacks=1, residual_channels=16,
            gate_channels=16, skip_out_channels=16, cin_channels=-1,
            upsample_conditional_features=False, compute_dtype="",
            optimizer_params={"lr": 1e-3, "eps": 1e-8, "weight_decay": 0.0},
            lr_schedule="")


def _batch(B=8, T=32, C=256, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(0, C, (B, T))
    return {
        "x": jnp.asarray(np.eye(C, dtype=np.float32)[ids]),
        "y": jnp.asarray(ids, dtype=jnp.int32),
        "input_lengths": jnp.asarray([T] * B, dtype=jnp.int32),
    }


def test_virtual_devices_present():
    assert jax.device_count() == 8, jax.devices()


def test_make_mesh_shapes():
    mesh = make_mesh({"data": -1})
    assert mesh.shape["data"] == 8
    mesh2 = make_mesh({"data": 4, "model": 2})
    assert mesh2.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh({"data": 3})


def test_data_parallel_batch_size():
    mesh = make_mesh({"data": -1})
    assert data_parallel_batch_size(8, mesh) == 8
    assert data_parallel_batch_size(9, mesh) == 16


def test_sharded_train_step_matches_single_device():
    cfg = Config(**TINY)
    state = create_train_state(cfg)
    train_step, _ = make_train_step(cfg)
    batch = _batch()
    rng = jax.random.PRNGKey(0)

    # single device baseline
    s_single, m_single = train_step(state, batch, rng)

    # sharded: batch over 8 devices, state replicated
    mesh = make_mesh({"data": -1})
    state_sh = shard_state(create_train_state(cfg), mesh)
    batch_sh = shard_batch(batch, mesh)
    s_shard, m_shard = train_step(state_sh, batch_sh, rng)

    np.testing.assert_allclose(float(m_single["loss"]), float(m_shard["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single.params),
                    jax.tree.leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)

    # several more steps stay in agreement (grad psum correctness)
    for i in range(3):
        k = jax.random.fold_in(rng, i)
        s_single, m1 = train_step(s_single, batch, k)
        s_shard, m2 = train_step(s_shard, batch_sh, k)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-4)


def test_sharded_generation_matches_single_device():
    from wavenet_vocoder_tpu.models.wavenet import WaveNetSpec, init_wavenet
    spec = WaveNetSpec(out_channels=256, layers=2, stacks=1,
                       residual_channels=16, gate_channels=16,
                       skip_out_channels=16, cin_channels=4,
                       scalar_input=False)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    B, Tmel = 8, 24
    c = jax.random.normal(jax.random.PRNGKey(1), (B, Tmel, 4))

    out_single = generate(params, spec, jax.random.PRNGKey(2), c=c)

    mesh = make_mesh({"data": -1})
    params_sh = shard_state(params, mesh)
    c_sh = shard_batch(c, mesh)
    out_shard = generate(params_sh, spec, jax.random.PRNGKey(2), c=c_sh)

    np.testing.assert_allclose(np.asarray(out_single["samples"]),
                               np.asarray(out_shard["samples"]), atol=1e-5)


def test_tensor_parallel_matches_replicated():
    """Gate-channel tensor parallelism (Megatron-style column/row rules) must
    be numerically equivalent to replicated execution — XLA inserts the
    collectives from the param shardings alone."""
    from wavenet_vocoder_tpu.parallel.sharding import shard_params_tp
    cfg = Config(**{**TINY, "gate_channels": 32, "cin_channels": 4,
                    "upsample_conditional_features": False})
    state = create_train_state(cfg)
    train_step, _ = make_train_step(cfg)
    rs = np.random.RandomState(0)
    B, T = 8, 32
    ids = rs.randint(0, 256, (B, T))
    batch = {
        "x": jnp.asarray(np.eye(256, dtype=np.float32)[ids]),
        "y": jnp.asarray(ids, dtype=jnp.int32),
        "c": jnp.asarray(rs.randn(B, T, 4), jnp.float32),
        "input_lengths": jnp.asarray([T] * B, jnp.int32),
    }
    rng = jax.random.PRNGKey(0)

    s_repl, m_repl = train_step(state, batch, rng)

    mesh = make_mesh({"data": 4, "model": 2})
    state_tp = shard_state(create_train_state(cfg), mesh)
    state_tp = state_tp.replace(
        params=shard_params_tp(state_tp.params, mesh))
    batch_sh = shard_batch(batch, mesh)
    s_tp, m_tp = train_step(state_tp, batch_sh, rng)

    np.testing.assert_allclose(float(m_repl["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_repl.params),
                    jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)


def test_checkpoint_resume_under_mesh(tmp_path):
    """Save mid-run from a SHARDED state, restore, re-shard, continue —
    must match the uninterrupted sharded run exactly (checkpoints are
    host-numpy pytrees, so device layout round-trips losslessly)."""
    from wavenet_vocoder_tpu.training.checkpoint import (
        load_checkpoint, save_checkpoint)

    cfg = Config(**TINY)
    train_step, _ = make_train_step(cfg)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    mesh = make_mesh({"data": -1})
    batch_sh = shard_batch(batch, mesh)

    state = shard_state(create_train_state(cfg), mesh)
    state, _ = train_step(state, batch_sh, rng)
    state, _ = train_step(state, batch_sh, rng)
    path = save_checkpoint(str(tmp_path), state, global_step=2)

    # uninterrupted continuation
    cont, m_ref = train_step(state, batch_sh, rng)

    # cold restore into a fresh state, re-shard, continue
    fresh = shard_state(create_train_state(cfg), mesh)
    restored, counters = load_checkpoint(path, fresh)
    assert counters["global_step"] == 2
    restored = shard_state(restored, mesh)
    resumed, m_res = train_step(restored, batch_sh, rng)

    np.testing.assert_allclose(float(m_ref["loss"]), float(m_res["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree.leaves(cont.params),
                    jax.tree.leaves(resumed.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
