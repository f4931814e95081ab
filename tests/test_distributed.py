"""Multi-host (multi-process) training bring-up.

The reference's only parallelism is single-host DataParallel
(reference: train.py:676-689). SURVEY.md sections 2.4/5.8 call for the TPU
equivalent: processes joined by jax.distributed.initialize, one global Mesh,
per-process local batches assembled into global sharded arrays. Here a REAL
2-process cluster runs on localhost CPU (2 virtual devices each -> 4 global)
and must reproduce the single-process step exactly: same loss, same params.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_dataset_shard_disjoint_and_complete(tmp_path):
    """Per-process corpus slices partition the utterance list."""
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.data.dataset import WaveNetDataset

    cfg = Config(max_time_steps=256, hop_size=64, cin_pad=0, cin_channels=8,
                 num_mels=8)
    rs = np.random.RandomState(0)
    for i in range(7):
        frames = 8 + i
        np.save(tmp_path / f"u{i}-wave.npy",
                rs.randn(frames * 64).astype(np.float32))
        np.save(tmp_path / f"u{i}-feats.npy",
                rs.randn(frames, 8).astype(np.float32))
    ds = WaveNetDataset(str(tmp_path), cfg)
    n_total = len(ds)
    shards = [ds.shard(i, 3) for i in range(3)]
    # shards are disjoint AND equal-length (truncated): every process must
    # run the same number of batches or the SPMD collectives deadlock
    assert len({len(s) for s in shards}) == 1
    paths = [u.wave_path for s in shards for u in s.utterances]
    assert len(paths) == len(set(paths))
    assert len(paths) == 3 * (n_total // 3)
    assert ds.shard(0, 1) is ds


@pytest.mark.parametrize("fused", [False, True],
                         ids=["xla", "fused_shard_map"])
def test_two_process_training_matches_single_process(tmp_path, fused):
    """Spawn a REAL 2-process jax.distributed cluster (localhost CPU) and
    assert 3 data-parallel train steps produce the single-process loss and
    parameters — the collectives, the global-batch assembly, and the
    replicated-state constructor all have to be right for this to hold.
    The fused variant additionally dispatches the Pallas residual stack
    through shard_map over the MULTI-HOST mesh (the production train path)."""
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,  # bypasses any site PYTHONPATH (compile relays)
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_DEFAULT_MATMUL_PRECISION": "float32",
    }
    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"proc{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--out", str(out)] + (["--fused"] if fused else []),
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["global_devices"] == 4 for r in results)
    # both processes see the identical replicated result
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=1e-6)
    assert results[0]["checksum"] == pytest.approx(results[1]["checksum"],
                                                   rel=1e-6)

    # single-process reference on the SAME global batch / config / seed
    _check_single_process_reference(results, fused)


def _check_single_process_reference(results, fused):
    sys.path.insert(0, os.path.join(REPO, "tests"))
    import _distributed_worker as w
    import jax
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)

    cfg = w.make_cfg(fused=fused)
    batch = jax.device_put(w.make_global_batch(B=cfg.batch_size))
    state = create_train_state(cfg)
    step, _ = make_train_step(cfg)
    state, loss = w.run_steps(state, step, batch)
    assert results[0]["loss"] == pytest.approx(loss, rel=1e-5)
    assert results[0]["checksum"] == pytest.approx(w.checksum(state.params),
                                                   rel=1e-5)


def test_two_process_train_loop_end_to_end(tmp_path):
    """The FULL train_loop over a real 2-process cluster: per-process corpus
    shards, global-batch assembly, the host-batch sanity check, and
    primary-only checkpoint/metric writes — the integration layer the
    step-level test above bypasses (a device_get on a multi-host batch in
    sanity_check crashed exactly here before)."""
    rs = np.random.RandomState(0)
    dump = tmp_path / "dump"
    dump.mkdir()
    for i in range(6):
        T = 640 + 64 * i
        np.save(dump / f"u{i}-wave.npy",
                rs.uniform(-0.5, 0.5, T).astype(np.float32))
    ckpt = tmp_path / "ckpt"

    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
    }
    procs, outs, logs = [], [], []
    for pid in range(2):
        out = tmp_path / f"loop{pid}.json"
        outs.append(out)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--out", str(out), "--train-loop-dump", str(dump),
             "--checkpoint-dir", str(ckpt)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("train_loop worker timed out (likely an SPMD "
                        "desync between processes)")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    assert all(r["final_step"] == 2 for r in results)
    # primary-only writes: checkpoints + metrics exist exactly once
    assert (ckpt / "checkpoint_latest.npz").exists()
    assert (ckpt / "hparams.json").exists()
    assert (ckpt / "log" / "metrics.jsonl").exists()


def test_two_process_evaluate_writes_disjoint_shards(tmp_path):
    """Multi-process evaluate (VERDICT r4 #8): the utterance list is
    strided per process (SURVEY section 5.8 — synthesis is collective-free
    across utterances), so two processes must write DISJOINT wav sets whose
    union covers the corpus, plus per-process shard manifests."""
    import jax

    # tiny mulaw preset; upsample derives generation length from the mel
    preset = {
        "name": "wavenet_vocoder",
        "input_type": "mulaw-quantize", "quantize_channels": 256,
        "out_channels": 256, "sample_rate": 16000, "hop_size": 128,
        "num_mels": 8, "cin_channels": 8, "cin_pad": 0,
        "upsample_conditional_features": True,
        "upsample_params": {"upsample_scales": [4, 4, 8]},
        "layers": 2, "stacks": 1, "residual_channels": 8,
        "gate_channels": 8, "skip_out_channels": 8,
        "compute_dtype": "", "lr_schedule": "",
    }
    preset_path = tmp_path / "preset.json"
    preset_path.write_text(json.dumps(preset))

    from wavenet_vocoder_tpu.config import load_config
    from wavenet_vocoder_tpu.training.checkpoint import save_checkpoint
    from wavenet_vocoder_tpu.training.train_state import create_train_state
    cfg = load_config(str(preset_path), "")
    state = create_train_state(cfg)
    ckpt_dir = tmp_path / "ckpt"
    save_checkpoint(str(ckpt_dir), state, global_step=0)
    ckpt = str(ckpt_dir / "checkpoint_latest.npz")

    dump = tmp_path / "dump"
    dump.mkdir()
    rs = np.random.RandomState(0)
    n_utt = 6
    for i in range(n_utt):
        np.save(dump / f"u{i}-feats.npy",
                rs.randn(4 + i % 2, 8).astype(np.float32))

    out_dir = tmp_path / "generated"
    port = _free_port()
    env = {
        "PATH": os.environ.get("PATH", "/usr/bin:/bin"),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
    }
    procs, logs = [], []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "wavenet_vocoder_tpu.cli.evaluate",
             str(dump), ckpt, str(out_dir), "--preset", str(preset_path),
             "--batch-size", "2", "--engine", "scan",
             "--coordinator-address", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("evaluate worker timed out")
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"evaluate worker failed:\n{log[-4000:]}"

    gens = sorted(f for f in os.listdir(out_dir) if f.endswith("_gen.wav"))
    assert len(gens) == n_utt, gens
    # per-process manifests exist and partition the corpus disjointly
    shard_lists = []
    for pid in range(2):
        mpath = out_dir / f"eval_manifest.proc{pid}.txt"
        assert mpath.exists()
        shard_lists.append(mpath.read_text().split())
    assert len(shard_lists[0]) + len(shard_lists[1]) == n_utt
    assert not set(shard_lists[0]) & set(shard_lists[1])
    assert sorted(shard_lists[0] + shard_lists[1]) == gens
