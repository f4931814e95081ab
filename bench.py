"""Benchmark: batched autoregressive synthesis throughput on one chip.

Metric (BASELINE.json): generated audio-seconds per wall-second per chip for
the flagship 24-layer MoL WaveNet (reference default scale, hparams.py:58-65).
Baseline = 1.0x real-time per chip (the reference's stated target; its own
Python loop runs far below real time — ~125 host-dispatched GEMVs per sample,
reference: wavenet.py:296-336).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _make_synthetic_dump(root, cfg, n_utts=48, seed=0):
    """On-disk dump dir (the *-wave.npy / *-feats.npy glob layout) so the
    pipeline bench exercises the REAL DataLoader: npy read, length-bucket
    sampling, hop-aligned crop, collate, prefetch."""
    import numpy as np
    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(seed)
    hop = cfg.hop_size
    min_samples = cfg.max_time_steps + 2 * cfg.cin_pad * hop
    for i in range(n_utts):
        frames = (min_samples // hop) + 2 + rs.randint(0, 20)
        T = frames * hop
        wave = rs.uniform(-0.5, 0.5, T).astype(np.float32)
        feats = rs.randn(frames, cfg.num_mels).astype(np.float32)
        np.save(os.path.join(root, f"synth{i:04d}-wave.npy"), wave)
        np.save(os.path.join(root, f"synth{i:04d}-feats.npy"), feats)
    return root


def bench_train():
    """BENCH_MODE=train: training samples/sec on the flagship MoL config
    (reference wall-clock anchor: ~1.26 steps/s x 8x10240 samples on GPU,
    docs/content/index.md '100k steps (~22 hours)' => ~103k samples/s).

    Reports model FLOPs and MFU. BENCH_PIPELINE=1 feeds the step from the
    REAL DataLoader (threaded collate + device_put double-buffering) off an
    on-disk synthetic dump, so host-side input cost is measured, not hidden.
    """
    import numpy as np
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)
    from wavenet_vocoder_tpu.utils import flops as flops_lib

    pipeline = bool(int(os.environ.get("BENCH_PIPELINE", "0")))
    # flagship MoL, 10240 crop, bf16 compute. Default path: the FUSED
    # residual-stack kernel (ops/pallas_train.py, v2 carry/boundary-stash
    # kernels) — B=32: 3.21M samples/s (0.102s/step, MFU 35.8%), B=64:
    # 3.33M (0.197s/step, MFU 37.0%, peak); r3 v1 kernels were 2.71M.
    # BENCH_FUSED=0 gives the XLA layer-loop path: B=8: 1.15M, 16: 1.89M,
    # 32: 2.04M (peak — AT the HBM roofline: 133.7GB/step at 819GB/s ≈ the
    # whole step time; that roofline is WHY the fused kernel wins — it cuts
    # HBM traffic ~12x), 64: 1.77M, 128: OOM; remat hurts either path
    # (recompute adds traffic).
    B = int(os.environ.get("BENCH_BATCH", 32))
    fused = bool(int(os.environ.get("BENCH_FUSED", "1")))
    cfg = Config(remat=bool(int(os.environ.get("BENCH_REMAT", "0"))),
                 remat_policy=os.environ.get("BENCH_REMAT_POLICY", ""),
                 fused_train=fused,
                 dropout=float(os.environ.get("BENCH_DROPOUT", "0.0")),
                 batch_size=B, num_workers=4)
    T = cfg.max_time_steps
    frames = T // cfg.hop_size + 2 * cfg.cin_pad
    rs = np.random.RandomState(0)
    x = rs.uniform(-0.5, 0.5, (B, T, 1)).astype(np.float32)
    batch = {
        "x": x, "y": x.copy(),
        "c": rs.randn(B, frames, cfg.num_mels).astype(np.float32),
        "input_lengths": np.full(B, T, np.int32),
    }
    batch = jax.device_put(batch)
    state = create_train_state(cfg)
    train_step, _ = make_train_step(cfg)
    key = jax.device_put(jax.random.PRNGKey(0))
    state, m = train_step(state, batch, key)  # compile
    _ = float(m["loss"])                      # forces real completion

    spec = spec_from_config(cfg)
    # exact per-step FLOPs from the compiled executable when the backend
    # reports it; analytic fwd+bwd (3x fwd matmuls) otherwise
    ca = flops_lib.xla_cost_analysis(train_step, state, batch, key) or {}
    step_flops = float(ca.get("flops", 0)) or None
    step_bytes = float(ca.get("bytes accessed", 0)) or None
    flops_src = "xla_cost_analysis"
    analytic = flops_lib.train_flops_per_sample(spec) * B * T
    if step_flops is None or step_flops < 0.5 * analytic:
        # cost analysis can't see inside pallas custom-calls (fused path)
        step_flops = analytic
        flops_src = "analytic_3x_forward"
    peak = flops_lib.device_peak_flops()
    hbm_bw = flops_lib.device_peak_hbm_bw()
    if os.environ.get("BENCH_PEAK_TFLOPS"):
        peak = float(os.environ["BENCH_PEAK_TFLOPS"]) * 1e12

    # dispersion: n_blocks timed blocks of n_iters steps each; one host
    # sync per block (per-step syncs cost ~100ms each through the relay
    # and would swamp a 0.1s step). Report min/median across blocks so a
    # contended-chip session is visible in the artifact (VERDICT r4 #7).
    n_iters = int(os.environ.get("BENCH_ITERS", 10))
    n_blocks = int(os.environ.get("BENCH_BLOCKS", 3))
    times = []
    if pipeline:
        from wavenet_vocoder_tpu.data import DataLoader, WaveNetDataset
        from wavenet_vocoder_tpu.data.prefetch import prefetch_to_device
        import itertools, tempfile
        root = os.environ.get("BENCH_DATA_DIR") or os.path.join(
            tempfile.gettempdir(), f"wn_bench_dump_b{cfg.num_mels}")
        if not os.path.exists(os.path.join(root, "synth0000-wave.npy")):
            _make_synthetic_dump(root, cfg)
        ds = WaveNetDataset(root, cfg)
        loader = DataLoader(ds, cfg, batch_size=B, num_workers=4)

        def batches():
            # cycle epochs so n_iters isn't bounded by the synthetic corpus
            while True:
                yield from loader

        it = prefetch_to_device(batches(), depth=2)
        state, m = train_step(state, next(it), key)  # warm pipeline path
        _ = float(m["loss"])
        for _b in range(n_blocks):
            t0 = time.perf_counter()
            for i in range(n_iters):
                state, m = train_step(state, next(it), key)
            loss = float(m["loss"])  # device->host sync (relay-safe)
            times.append((time.perf_counter() - t0) / n_iters)
    else:
        for _b in range(n_blocks):
            t0 = time.perf_counter()
            for i in range(n_iters):
                state, m = train_step(state, batch, key)
            loss = float(m["loss"])  # device->host sync (relay-safe)
            times.append((time.perf_counter() - t0) / n_iters)
    dt = float(np.median(times))
    value = B * T / dt
    baseline = 1.26 * 8 * 10240  # reference ~1.26 steps/s at 8x10240
    achieved = step_flops / dt
    print(json.dumps({
        "metric": "training_samples_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "samples/s/chip",
        "vs_baseline": round(value / baseline, 4),
        "detail": {"batch": B, "crop": T, "step_s": round(dt, 4),
                   "step_s_min": round(min(times), 4),
                   "step_s_max": round(max(times), 4),
                   "blocks": n_blocks, "iters_per_block": n_iters,
                   "steps_per_s": round(1.0 / dt, 2), "loss": round(loss, 3),
                   "pipeline": "real_dataloader" if pipeline
                   else "constant_batch",
                   "step_tflops": round(step_flops / 1e12, 3),
                   "flops_source": flops_src,
                   "achieved_tflops_per_s": round(achieved / 1e12, 2),
                   "mfu": (round(achieved / peak, 4) if peak else None),
                   "peak_tflops": (round(peak / 1e12) if peak else None),
                   # roofline: if the HBM-bandwidth floor accounts for most
                   # of the step time, the step is memory-bound, not MXU-bound
                   "step_gbytes": (round(step_bytes / 1e9, 2)
                                   if step_bytes else None),
                   "hbm_floor_s": (round(step_bytes / hbm_bw, 4)
                                   if step_bytes and hbm_bw else None),
                   "hbm_bound_frac": (round(step_bytes / hbm_bw / dt, 3)
                                      if step_bytes and hbm_bw else None),
                   "device": str(jax.devices()[0])},
    }))


def measure_train_compact():
    """A few timed fused-train steps at flagship B=32 for the default bench
    artifact (VERDICT r4 #2): training_samples_per_sec_per_chip + MFU ride
    along with the synthesis headline. Reference anchor ~1.26 steps/s at
    8x10240 on GPU (docs/content/index.md '100k steps (~22 hours)')."""
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)
    from wavenet_vocoder_tpu.utils import flops as flops_lib

    # B=64 is the best per-sample point that keeps the record short
    # (0.169 s/step, MFU 43%; B=96/128 reach 45-47% but triple the
    # record's wall time — see CLAUDE.md r5 numbers)
    B = int(os.environ.get("BENCH_TRAIN_BATCH", 64))
    cfg = Config(fused_train=True, batch_size=B)
    T = cfg.max_time_steps
    frames = T // cfg.hop_size + 2 * cfg.cin_pad
    rs = np.random.RandomState(0)
    x = rs.uniform(-0.5, 0.5, (B, T, 1)).astype(np.float32)
    batch = jax.device_put({
        "x": x, "y": x.copy(),
        "c": rs.randn(B, frames, cfg.num_mels).astype(np.float32),
        "input_lengths": np.full(B, T, np.int32),
    })
    state = create_train_state(cfg)
    train_step, _ = make_train_step(cfg)
    key = jax.device_put(jax.random.PRNGKey(0))
    state, m = train_step(state, batch, key)  # compile
    loss = float(m["loss"])                   # forces real completion
    n_iters = int(os.environ.get("BENCH_TRAIN_ITERS", 5))
    n_blocks = int(os.environ.get("BENCH_TRAIN_BLOCKS", 3))
    times = []
    for _b in range(n_blocks):
        t0 = time.perf_counter()
        for _ in range(n_iters):
            state, m = train_step(state, batch, key)
        loss = float(m["loss"])  # one sync per block (relay-safe)
        times.append((time.perf_counter() - t0) / n_iters)
    dt = float(np.median(times))
    spec = spec_from_config(cfg)
    step_flops = flops_lib.train_flops_per_sample(spec) * B * T
    peak = flops_lib.device_peak_flops()
    baseline = 1.26 * 8 * 10240
    return {
        "metric": "training_samples_per_sec_per_chip",
        "value": round(B * T / dt, 1),
        "vs_baseline": round(B * T / dt / baseline, 2),
        "batch": B, "crop": T, "step_s": round(dt, 4),
        "step_s_min": round(min(times), 4),
        "step_s_max": round(max(times), 4),
        "blocks": n_blocks, "iters_per_block": n_iters,
        "loss": round(loss, 3),
        "mfu": (round(step_flops / dt / peak, 4) if peak else None),
        "path": "fused_pallas",
    }


def bench_latency():
    """BENCH_MODE=latency: small-batch streaming serving numbers on the
    fused pallas engine — first-audio latency and steady-state per-stream
    realtime factor (the throughput bench's B=128..256 sweet spot trades
    per-stream speed for aggregate throughput; this is the other end).

    Knobs: BENCH_BATCH (streams, default 1), BENCH_SEG_FRAMES (mel frames
    fed per call, default 4 = 1024 samples), BENCH_SECONDS.
    """
    import numpy as np
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import (
        init_wavenet, spec_from_config)
    from wavenet_vocoder_tpu.streaming import StreamingSynthesizer

    cfg = Config()
    spec = spec_from_config(cfg)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    B = int(os.environ.get("BENCH_BATCH", 1))
    seg_frames = int(os.environ.get("BENCH_SEG_FRAMES", 4))
    seconds = float(os.environ.get("BENCH_SECONDS", 2.0))
    hop = cfg.hop_size
    frames = int(seconds * cfg.sample_rate) // hop
    rs = np.random.RandomState(0)
    mel = rs.randn(B, frames, cfg.num_mels).astype(np.float32)

    stream = StreamingSynthesizer(params, cfg, rng=jax.random.PRNGKey(1),
                                  batch=B, engine="pallas")
    print("# latency bench: weights packed", file=sys.stderr)

    def run_stream():
        stream.reset()
        t0 = time.perf_counter()
        t_first = None
        n = 0
        for i in range(0, frames, seg_frames):
            out = stream.feed(mel[:, i:i + seg_frames])
            n += out.shape[1]
            if t_first is None and n > 0:
                t_first = time.perf_counter() - t0
        n += stream.flush().shape[1]
        return t_first, time.perf_counter() - t0, n

    run_stream()  # compile both segment shapes (feed + flush)
    print("# latency bench: compiled; measuring", file=sys.stderr)
    t_first, wall, n = run_stream()
    audio_s = n / cfg.sample_rate
    per_stream_rt = audio_s / wall
    print(json.dumps({
        "metric": "streaming_latency_per_stream_realtime_x",
        "value": round(per_stream_rt, 3),
        "unit": "x realtime per stream",
        "vs_baseline": round(per_stream_rt / 1.0, 3),
        "detail": {
            "streams": B,
            "first_audio_latency_ms": round(t_first * 1e3, 1),
            "algorithmic_latency_ms": round(
                (cfg.cin_pad + len(cfg.upsample_params["upsample_scales"]))
                * hop / cfg.sample_rate * 1e3, 1),
            "segment_samples": seg_frames * hop,
            "total_audio_s": round(audio_s, 2),
            "wall_s": round(wall, 3),
            "aggregate_audio_sec_per_s": round(B * per_stream_rt, 2),
            "model": "24L/4S MoL 128/256/128",
            "engine": "pallas+carry",
            "device": str(jax.devices()[0]),
        },
    }))


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    if os.environ.get("BENCH_MODE") == "train":
        return bench_train()
    if os.environ.get("BENCH_MODE") == "latency":
        return bench_latency()

    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import init_wavenet, spec_from_config
    from wavenet_vocoder_tpu.ops.generate import generate
    from wavenet_vocoder_tpu.synthesis import pad_mel_context

    # flagship MoL: 24 layers, 128/256/128, 80-mel upsampled. BENCH_MODEL
    # picks the published big configs (reference docs/content/index.md:126-128,
    # tests/test_misc.py:9): "30L3S" = 6139-sample receptive field;
    # "512ch" = 512-residual scale. Both ride the auto-batch-split path.
    model_name = os.environ.get("BENCH_MODEL", "flagship")
    overrides = {
        "flagship": {},
        "30L3S": {"layers": 30, "stacks": 3},
        "512ch": {"residual_channels": 512, "gate_channels": 512,
                  "skip_out_channels": 256},
    }[model_name]
    cfg = Config(**overrides)
    spec = spec_from_config(cfg)
    params = init_wavenet(jax.random.PRNGKey(0), spec)

    # Per-step cost is latency-bound, so batch rides cheaply until ring-buffer
    # VMEM traffic dominates. Measured sweep on v5e-1 (audio-sec/s/chip),
    # 8-iter runs: B=32: 105, B=64: 167, B=128: ~206, B=256: ~240 (peak; needs
    # the raised Mosaic scoped-VMEM limit, which PallasGenerator auto-applies),
    # B=384: 105, B=512: 110 (both pathological). chunk=256 beats 64/128/512
    # at B>=128. (Reference recipes use batch 32, run.sh:31.)
    B = int(os.environ.get("BENCH_BATCH", 256))
    # second measurement: the largest batch sustaining >=1x per-stream
    # realtime (BASELINE.json's target is per-utterance realtime; B=256
    # maximizes aggregate throughput but runs each stream at ~0.8x).
    # Measured on v5e-1: B=128 -> ~1.6x/stream. BENCH_RT_BATCH=0 disables.
    B_rt = int(os.environ.get("BENCH_RT_BATCH", 128))
    seconds = float(os.environ.get("BENCH_SECONDS", 1.0))
    hop = cfg.hop_size
    frames = int(seconds * cfg.sample_rate) // hop
    T = frames * hop

    rs = np.random.RandomState(0)
    mel = rs.randn(B, frames, cfg.num_mels).astype(np.float32)
    c = jnp.asarray(pad_mel_context(mel, cfg.cin_pad))

    engine = os.environ.get("BENCH_ENGINE", "pallas")
    if engine == "pallas":
        from wavenet_vocoder_tpu.ops.pallas_generate import (
            DEFAULT_CHUNK, PallasGenerator)
        chunk = int(os.environ.get("BENCH_CHUNK", DEFAULT_CHUNK))
        vmem_mb = os.environ.get("BENCH_VMEM_MB")
        variant = os.environ.get("BENCH_VARIANT", "fused")
        if int(os.environ.get("BENCH_SPLIT_TAPS", "0")):
            variant = "split_taps"
        mesh = None
        if int(os.environ.get("BENCH_MESH", "0")):
            # dispatch through the multi-chip shard_map wrapper (all local
            # devices; on a 1-chip host this measures pure wrapper overhead —
            # per-chip throughput should be unchanged)
            from wavenet_vocoder_tpu.parallel import make_mesh
            mesh = make_mesh({"data": -1})
        gen = PallasGenerator(  # pack weights ONCE
            params, spec, chunk=chunk,
            vmem_limit_bytes=None if vmem_mb is None
            else int(float(vmem_mb) * 2 ** 20),
            variant=variant, mesh=mesh,
            unroll=int(os.environ.get("BENCH_UNROLL", "1")))
        est = gen.estimate_vmem_bytes(B)
        print(f"# pallas vmem estimate: {est / 2**20:.1f} MiB "
              f"(B={B}, chunk={chunk})", file=sys.stderr)

        def run(key, c_arr):
            s = gen(key, c=c_arr, log_scale_min=cfg.log_scale_min)
            # NOTE: force a real device->host transfer. Under the axon relay,
            # block_until_ready() returns before execution completes, giving
            # fantasy timings; np.asarray round-trips actual values.
            return np.asarray(s)[..., None]
    else:
        def run(key, c_arr):
            out = generate(params, spec, key, c=c_arr, output="samples",
                           log_scale_min=cfg.log_scale_min)
            return np.asarray(out["samples"])

    n_iters = int(os.environ.get("BENCH_ITERS", 3))

    def measure(c_arr):
        """Per-iter wall times (each run() forces a host transfer, so every
        iter is a real sync). Returns the list — median is the headline,
        min/max expose contended-chip sessions (VERDICT r4 #7)."""
        run(jax.random.PRNGKey(0), c_arr)  # compile + warm up
        ts = []
        for i in range(n_iters):
            t0 = time.perf_counter()
            s = run(jax.random.PRNGKey(i + 1), c_arr)
            ts.append(time.perf_counter() - t0)
        assert np.isfinite(s).all() and s.std() > 0.01, "degenerate output"
        return ts

    times = measure(c)
    dt = float(np.median(times))
    audio_seconds = B * T / cfg.sample_rate
    value = audio_seconds / dt
    baseline = 1.0  # 1x real-time per chip

    # Both ends of the throughput/latency trade in one record (BASELINE.json
    # north star is >=1x PER-UTTERANCE realtime; the headline batch
    # maximizes aggregate throughput at <1x/stream)
    rt_detail = None
    if B_rt and B_rt != B:
        mel_rt = (mel[:B_rt] if B_rt <= B else
                  rs.randn(B_rt, frames, cfg.num_mels).astype(np.float32))
        c_rt = jnp.asarray(pad_mel_context(mel_rt, cfg.cin_pad))
        times_rt = measure(c_rt)
        dt_rt = float(np.median(times_rt))
        rt_detail = {
            "batch": B_rt,
            "audio_sec_per_sec": round(B_rt * T / cfg.sample_rate / dt_rt, 2),
            "per_stream_realtime_x": round(T / cfg.sample_rate / dt_rt, 2),
            "wall_s_min": round(min(times_rt), 3),
            "wall_s_max": round(max(times_rt), 3),
        }
    train_detail = None
    if int(os.environ.get("BENCH_TRAIN", "1")):
        # compact train-step record in the same artifact (VERDICT r4 #2):
        # the driver captures only the default bench output, so the
        # training claim rides along here. Kept short; guarded so a
        # training-path failure never loses the synthesis metric.
        try:
            train_detail = measure_train_compact()
        except Exception as e:  # pragma: no cover - defensive for driver
            train_detail = {"error": f"{type(e).__name__}: {e}"}
    print(json.dumps({
        "metric": "batched_synthesis_audio_sec_per_sec_per_chip",
        "value": round(value, 4),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(value / baseline, 4),
        "detail": {
            "batch": B, "samples_per_utt": T,
            "samples_per_sec": round(B * T / dt, 1),
            "per_stream_realtime_x": round(T / cfg.sample_rate / dt, 2),
            # best-window per-stream factor: the shared chip's contention
            # swings medians by 10-30%; the min iter shows what the kernel
            # sustains uncontended (r5 record: 1.016x at B=256)
            "per_stream_realtime_x_best": round(
                T / cfg.sample_rate / min(times), 3),
            "wall_s_per_iter": round(dt, 3),
            "wall_s_min": round(min(times), 3),
            "wall_s_max": round(max(times), 3),
            "iters": n_iters,
            "realtime_batch": rt_detail,
            "training": train_detail,
            "model": {"flagship": "24L/4S MoL 128/256/128",
                      "30L3S": "30L/3S MoL 128/256/128 (rf 6139)",
                      "512ch": "24L/4S MoL 512/512/256"}[model_name],
            "engine": engine,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
