#!/usr/bin/env python
"""Timing knockouts for the fused generation kernel (VERDICT r5 #1).

The Pallas kernel is ONE opaque op to the profiler, so per-op attribution
inside the AR step is done by ablation: compile the kernel with one op
class disabled (GEN_KNOCKOUT, see ops/pallas_generate.py) and measure the
step-time delta. Output is numerically WRONG under a knockout — this
script only times.

    python scripts/knockout_gen.py base|glu|reads|writes|chainfree|\
        cond_static|head|det [--batch 256]

One knockout per process (the knob is read at kernel-build time).
"""
import argparse
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("knockout")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=1.0)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args(argv)
    det = args.knockout == "det"
    if args.knockout not in ("base", "det"):
        os.environ["GEN_KNOCKOUT"] = args.knockout

    import jax
    import jax.numpy as jnp
    import numpy as np
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import (
        init_wavenet, spec_from_config)
    from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
    from wavenet_vocoder_tpu.synthesis import pad_mel_context

    cfg = Config()
    spec = spec_from_config(cfg)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    B = args.batch
    hop = cfg.hop_size
    frames = int(args.seconds * cfg.sample_rate) // hop
    T = frames * hop
    rs = np.random.RandomState(0)
    mel = rs.randn(B, frames, cfg.num_mels).astype(np.float32)
    c = jnp.asarray(pad_mel_context(mel, cfg.cin_pad))
    gen = PallasGenerator(params, spec)

    def run(i):
        s = gen(jax.random.PRNGKey(i), c=c,
                log_scale_min=cfg.log_scale_min, deterministic=det)
        return np.asarray(s)  # forces real completion under the relay

    run(0)  # compile + warm
    ts = []
    for i in range(args.iters):
        t0 = time.perf_counter()
        run(i + 1)
        ts.append(time.perf_counter() - t0)
    dt = float(np.median(ts))
    print(json.dumps({
        "knockout": args.knockout, "batch": B, "samples": T,
        "wall_s": round(dt, 4), "us_per_step": round(dt / T * 1e6, 2),
        "audio_sec_per_s": round(B * T / cfg.sample_rate / dt, 1),
        "min_s": round(min(ts), 4), "max_s": round(max(ts), 4),
    }))


if __name__ == "__main__":
    main()
