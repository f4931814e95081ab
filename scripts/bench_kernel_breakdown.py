#!/usr/bin/env python
"""Decompose the fused AR kernel's per-step time on real TPU.

Varies one structural knob at a time around the flagship config and prints
per-step microseconds, to locate where generation time goes:
  * layers 6/12/24      -> per-layer cost (slope) vs fixed overhead (intercept)
  * deterministic on    -> cost of on-core PRNG + mixture sampling
  * no conditioning     -> cost of the cond DMA stream + fused cond rows
  * chunk 64/256        -> grid/pipeline overhead

Usage (TPU): python scripts/bench_kernel_breakdown.py [--batch 256]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=0.5)
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import (init_wavenet,
                                                    spec_from_config)
    from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
    from wavenet_vocoder_tpu.synthesis import pad_mel_context

    B = args.batch
    base = Config()  # flagship MoL
    hop = base.hop_size
    frames = int(args.seconds * base.sample_rate) // hop
    T = frames * hop
    rs = np.random.RandomState(0)

    def run_case(tag, cfg, *, cond=True, deterministic=False, chunk=256):
        spec = spec_from_config(cfg)
        params = init_wavenet(jax.random.PRNGKey(0), spec)
        gen = PallasGenerator(params, spec, chunk=chunk)
        c = None
        if cond:
            mel = rs.randn(B, frames, cfg.num_mels).astype(np.float32)
            c = pad_mel_context(mel, cfg.cin_pad)
        kw = dict(c=c, T=None if cond else T,
                  log_scale_min=cfg.log_scale_min,
                  deterministic=deterministic)
        np.asarray(gen(jax.random.PRNGKey(0), **kw))  # compile+warm
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = np.asarray(gen(jax.random.PRNGKey(i + 1), **kw))
        dt = (time.perf_counter() - t0) / args.iters
        us_per_step = dt / out.shape[1] * 1e6
        print(f"{tag:34s} {us_per_step:8.2f} us/step "
              f"({B * out.shape[1] / dt / 1e6:.2f} Msamples/s)", flush=True)
        return us_per_step

    print(f"batch={B}  T={T}  device={jax.devices()[0]}", flush=True)
    t24 = run_case("L=24 (flagship)", base)
    t12 = run_case("L=12", base.replace(layers=12, stacks=2))
    t6 = run_case("L=6", base.replace(layers=6, stacks=1))
    run_case("L=24 deterministic", base, deterministic=True)
    run_case("L=24 unconditional", base.replace(cin_channels=-1,
             upsample_conditional_features=False), cond=False)
    run_case("L=24 chunk=64", base, chunk=64)
    # linear fit us/step = a + b*L over (6, 12, 24)
    A = np.vstack([np.ones(3), [6, 12, 24]]).T
    coef, *_ = np.linalg.lstsq(A, np.array([t6, t12, t24]), rcond=None)
    print(f"\nfit: {coef[0]:.2f} us fixed + {coef[1]:.3f} us/layer "
          f"(layers account for {coef[1] * 24 / t24 * 100:.0f}% at L=24)")


if __name__ == "__main__":
    sys.exit(main())
