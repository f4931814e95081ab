"""Checkpoint robustness: atomic writes, npz (no-exec) format, legacy pickle
back-compat, corrupted-latest fallback (beats the reference's torch.load
pickle format, reference: train.py:852-884)."""
import os
import pickle

import jax
import numpy as np
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.training import checkpoint as ckpt
from wavenet_vocoder_tpu.training.train_state import (
    create_train_state,
    make_train_step,
)

import jax.numpy as jnp

TINY = dict(input_type="mulaw-quantize", quantize_channels=256,
            out_channels=256, layers=2, stacks=1, residual_channels=16,
            gate_channels=16, skip_out_channels=16, cin_channels=-1,
            upsample_conditional_features=False, compute_dtype="",
            exponential_moving_average=True,
            optimizer_params={"lr": 5e-3, "eps": 1e-8, "weight_decay": 0.0},
            lr_schedule="")


def _tiny_cfg(**kw):
    d = dict(TINY)
    d.update(kw)
    return Config(**d)


def _batch(B=2, T=64, C=256, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(0, C, (B, T))
    return {
        "x": jnp.asarray(np.eye(C, dtype=np.float32)[ids]),
        "y": jnp.asarray(ids, dtype=jnp.int32),
        "input_lengths": jnp.asarray([T, T - 10], dtype=jnp.int32),
    }


def _trained_state(cfg, steps=2):
    state = create_train_state(cfg)
    train_step, _ = make_train_step(cfg)
    for i in range(steps):
        state, _ = train_step(state, _batch(), jax.random.PRNGKey(i))
    return state


def test_npz_format_no_pickle(tmp_path):
    """The checkpoint is a plain npz zip — np.load(allow_pickle=False)
    succeeds, i.e. loading never executes arbitrary code."""
    cfg = _tiny_cfg()
    state = _trained_state(cfg)
    path = ckpt.save_checkpoint(str(tmp_path), state, global_step=2)
    assert path.endswith(".npz")
    with np.load(path, allow_pickle=False) as z:
        names = set(z.files)
    assert "manifest" in names and "param_0" in names


def test_interrupted_save_leaves_previous_checkpoint_intact(
        tmp_path, monkeypatch):
    """A crash mid-save (simulated by os.replace raising) never corrupts
    the existing checkpoint_latest — the write is tmp+rename atomic."""
    cfg = _tiny_cfg()
    state = _trained_state(cfg, steps=1)
    ckpt.save_checkpoint(str(tmp_path), state, global_step=1)
    latest = ckpt.latest_path(str(tmp_path))
    before = open(latest, "rb").read()

    state2 = _trained_state(cfg, steps=2)
    real_replace = os.replace
    calls = []

    def exploding_replace(src, dst):
        calls.append(dst)
        if dst == latest:
            raise OSError("simulated crash mid-save")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", exploding_replace)
    with pytest.raises(OSError):
        ckpt.save_checkpoint(str(tmp_path), state2, global_step=2)
    monkeypatch.undo()

    # the latest file is bit-identical to the pre-crash one and still loads
    assert open(latest, "rb").read() == before
    fresh = create_train_state(cfg)
    restored, counters = ckpt.load_checkpoint(latest, fresh)
    assert counters["global_step"] == 1


def test_corrupted_latest_falls_back_to_newest_step_file(tmp_path, capsys):
    cfg = _tiny_cfg()
    state = _trained_state(cfg, steps=1)
    ckpt.save_checkpoint(str(tmp_path), state, global_step=1)
    state2 = _trained_state(cfg, steps=2)
    ckpt.save_checkpoint(str(tmp_path), state2, global_step=2)
    latest = ckpt.latest_path(str(tmp_path))
    # truncate the latest file, as an unclean shutdown of a non-atomic
    # writer would
    data = open(latest, "rb").read()
    with open(latest, "wb") as f:
        f.write(data[: len(data) // 2])

    fresh = create_train_state(cfg)
    restored, counters = ckpt.load_checkpoint(latest, fresh)
    assert counters["global_step"] == 2  # newest intact step file wins
    assert "falling back" in capsys.readouterr().out
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # a corrupted STEP file (explicit user path) still raises
    step_path = ckpt.checkpoint_path(str(tmp_path), 2)
    with open(step_path, "wb") as f:
        f.write(b"garbage")
    with pytest.raises(Exception):
        ckpt.load_checkpoint(step_path, fresh)


def test_legacy_pickle_checkpoint_still_loads(tmp_path):
    """Checkpoints written by the pre-npz format (pickled dict of pytrees)
    keep loading."""
    cfg = _tiny_cfg()
    state = _trained_state(cfg, steps=2)
    legacy = str(tmp_path / "checkpoint_step000000002.pkl")
    payload = {
        "params": jax.tree.map(np.asarray, state.params),
        "optimizer_state": jax.tree.map(np.asarray, state.opt_state),
        "global_step": 2, "global_epoch": 1, "global_test_step": 3,
    }
    with open(legacy, "wb") as f:
        pickle.dump(payload, f)

    fresh = create_train_state(cfg)
    restored, counters = ckpt.load_checkpoint(legacy, fresh)
    assert counters == {"global_step": 2, "global_epoch": 1,
                        "global_test_step": 3}
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)
    # restore_parts works on the legacy format too
    parts = ckpt.restore_parts(legacy, fresh.params)
    np.testing.assert_allclose(
        np.asarray(parts["first_conv"]["v"]),
        np.asarray(state.params["first_conv"]["v"]))


def test_wrong_architecture_raises_clear_error(tmp_path):
    cfg = _tiny_cfg()
    state = _trained_state(cfg, steps=1)
    path = ckpt.save_checkpoint(str(tmp_path), state, global_step=1)
    cfg2 = _tiny_cfg(layers=4, stacks=2)
    fresh = create_train_state(cfg2)
    with pytest.raises(ValueError, match="wrong architecture"):
        ckpt.load_checkpoint(path, fresh)
