#!/usr/bin/env python
"""On-device TPU checks — the compiled-path twins of the CPU test suite.

Run on a machine with a real TPU: ``python scripts/run_tpu_checks.py``.
(The pytest suite forces the CPU platform for hermeticity; this script
verifies the same invariants compile and hold on actual hardware, including
the Mosaic-compiled Pallas kernel.)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import (
        WaveNetSpec, apply_wavenet, init_wavenet, spec_from_config)
    from wavenet_vocoder_tpu.ops.generate import generate
    from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
    from wavenet_vocoder_tpu.synthesis import pad_mel_context

    dev = jax.devices()[0]
    print(f"device: {dev}")
    failures = []

    def check(name, ok, detail=""):
        print(f"[{'PASS' if ok else 'FAIL'}] {name} {detail}")
        if not ok:
            failures.append(name)

    # 1. batch forward == teacher-forced scan, compiled on TPU
    spec = WaveNetSpec(out_channels=256, layers=4, stacks=2,
                       residual_channels=32, gate_channels=32,
                       skip_out_channels=32, cin_channels=4)
    p = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 2, 120
    ids = jax.random.randint(jax.random.PRNGKey(7), (B, T), 0, 256)
    x = jax.nn.one_hot(ids, 256)
    c = jax.random.normal(jax.random.PRNGKey(3), (B, T, 4))
    y_off = np.asarray(apply_wavenet(p, spec, x, c, softmax=True))
    y_on = np.asarray(generate(p, spec, jax.random.PRNGKey(5), test_inputs=x,
                               c=c, softmax=True, quantize=False)["samples"])
    diff = np.abs(y_off - y_on).max()
    check("scan == batch forward (TPU)", diff < 1e-4, f"maxdiff={diff:.2e}")

    # 2. Pallas kernel == scan, deterministic mode, compiled (Mosaic)
    gen = PallasGenerator(p, spec, weight_dtype=jnp.float32, chunk=16)
    codes_scan = np.argmax(np.asarray(
        generate(p, spec, jax.random.PRNGKey(2), c=c,
                 deterministic=True)["samples"]), -1)
    codes_pl = np.asarray(gen(jax.random.PRNGKey(2), c=c, deterministic=True))
    match = (codes_scan == codes_pl).mean()
    check("pallas == scan (categorical, compiled)", match == 1.0,
          f"match={match:.3f}")

    # 3. flagship generation sanity + throughput
    cfg = Config()
    fspec = spec_from_config(cfg)
    fp = init_wavenet(jax.random.PRNGKey(0), fspec)
    fgen = PallasGenerator(fp, fspec)
    Bf, frames = 8, 90
    mel = np.random.RandomState(0).randn(Bf, frames, 80).astype(np.float32)
    cf = jnp.asarray(pad_mel_context(mel, cfg.cin_pad))
    s = np.asarray(fgen(jax.random.PRNGKey(1), c=cf,
                        log_scale_min=cfg.log_scale_min))  # warm
    t0 = time.perf_counter()
    s = np.asarray(fgen(jax.random.PRNGKey(2), c=cf,
                        log_scale_min=cfg.log_scale_min))
    dt = time.perf_counter() - t0
    ok = np.isfinite(s).all() and 0.1 < s.std() < 1.0 and np.abs(s).max() <= 1.0
    rate = Bf * s.shape[1] / dt / cfg.sample_rate
    check("flagship pallas generation sane", ok,
          f"std={s.std():.3f} rate={rate:.1f} audio-sec/s")

    # 4. training step on TPU: finite loss, decreasing over a few steps
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)
    tcfg = Config(layers=4, stacks=2, residual_channels=32, gate_channels=32,
                  skip_out_channels=32, max_time_steps=2560,
                  lr_schedule="", batch_size=4)
    tspec = spec_from_config(tcfg)
    state = create_train_state(tcfg)
    step_fn, _ = make_train_step(tcfg, tspec)
    rs = np.random.RandomState(0)
    Tt = tcfg.max_time_steps
    xt = rs.uniform(-0.5, 0.5, (4, Tt, 1)).astype(np.float32)
    batch = jax.device_put({
        "x": xt, "y": xt.copy(),
        "c": rs.randn(4, Tt // 256 + 4, 80).astype(np.float32),
        "input_lengths": np.full(4, Tt, np.int32)})
    key = jax.device_put(jax.random.PRNGKey(0))
    first = None
    for i in range(8):
        state, m = step_fn(state, batch, key)
        if i == 0:
            first = float(m["loss"])
    last = float(m["loss"])
    check("train step loss decreases (TPU)", last < first,
          f"{first:.3f} -> {last:.3f}")

    print(f"\n{len(failures)} failure(s)" if failures else "\nALL TPU CHECKS PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
