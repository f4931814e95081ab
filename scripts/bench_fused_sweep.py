"""Sweep tile shapes for the fused training-stack kernel (ops/pallas_train).

Measures forward-only and forward+backward wall time of the fused residual
stack at several (Bt, Tt) combos in ONE process (axon relay is single-client).
Each measurement function is FULLY jitted — under the relay, eager op
dispatch costs ~100ms each, so un-jitted wrapper work both slows the sweep
and contaminates timings. Prints one JSON line per config.

Usage: python scripts/bench_fused_sweep.py
Knobs: SWEEP_B (batch, default 32), SWEEP_CONFIGS "bt:tt,bt:tt,..."
       (empty bt/tt = auto pick), SWEEP_ITERS (default 5),
       SWEEP_MODES (default "fwd,bwd").
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models.wavenet import spec_from_config
from wavenet_vocoder_tpu.ops.pallas_train import (
    fused_res_stack, pick_tiles, pick_tiles_fwd, stack_receptive)


def wait_for_claim():
    for i in range(60):
        try:
            np.asarray(jnp.ones(8) + 1.0)
            return
        except Exception as e:  # claim not yet released
            print(f"# waiting for TPU claim ({i}): {type(e).__name__}",
                  file=sys.stderr)
            time.sleep(10)
    raise RuntimeError("TPU claim never released")


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    wait_for_claim()
    print("# claim ok", file=sys.stderr)

    cfg = Config()
    spec = spec_from_config(cfg)
    L, k = spec.layers, spec.kernel_size
    R, G, S = (spec.residual_channels, spec.gate_channels,
               spec.skip_out_channels)
    cin = spec.cin_channels
    B = int(os.environ.get("SWEEP_B", 32))
    T = cfg.max_time_steps
    H = stack_receptive(spec.dilations, k)

    rs = np.random.RandomState(0)
    x0 = jax.device_put(rs.randn(B, T, R).astype(np.float32) * 0.1)
    c = jax.device_put(rs.randn(B, T, cin).astype(np.float32) * 0.1)
    G2 = G // 2
    blocks = []
    for l in range(L):
        blocks.append({
            "conv": {"w": (rs.randn(k, R, G) * (0.5 / np.sqrt(k * R))
                           ).astype(np.float32),
                     "b": np.zeros((G,), np.float32)},
            "cond_c": {"w": (rs.randn(1, cin, G) * 0.05).astype(np.float32)},
            "out": {"w": (rs.randn(1, G2, R) / np.sqrt(G2)
                          ).astype(np.float32),
                    "b": np.zeros((R,), np.float32)},
            "skip": {"w": (rs.randn(1, G2, S) / np.sqrt(G2)
                           ).astype(np.float32),
                     "b": np.zeros((S,), np.float32)},
        })
    blocks = jax.device_put(blocks)

    configs = os.environ.get("SWEEP_CONFIGS", ":,8:1024,1:2048").split(",")
    modes = os.environ.get("SWEEP_MODES", "fwd,bwd").split(",")
    iters = int(os.environ.get("SWEEP_ITERS", 5))
    for spec_str in configs:
        bt_s, _, tt_s = spec_str.partition(":")
        bt = int(bt_s) if bt_s else None
        tt = int(tt_s) if tt_s else None
        bt_b, tt_b = pick_tiles(B, T, H, L, R, bt, tt)
        bt_f, tt_f = pick_tiles_fwd(B, T, H, L, R, G, S, cin, bt, tt)

        @jax.jit
        def fwd_fn(x0, c, blocks):
            return jnp.sum(fused_res_stack(
                x0, c, blocks, spec, dtype=jnp.bfloat16, Bt=bt, Tt=tt))

        @jax.jit
        def bwd_fn(x0, c, blocks):
            def loss(blks):
                out = fused_res_stack(x0, c, blks, spec,
                                      dtype=jnp.bfloat16, Bt=bt, Tt=tt)
                return jnp.sum(out * out)
            g = jax.grad(loss)(blocks)
            return g[0]["conv"]["w"][0, 0, 0]

        for name, fn in (("fwd", fwd_fn), ("bwd", bwd_fn)):
            if name not in modes:
                continue
            tiles = ((bt_f, tt_f) if name == "fwd" and bt is None
                     else (bt_b, tt_b) if bt is None else (bt, tt))
            try:
                t_c0 = time.perf_counter()
                np.asarray(fn(x0, c, blocks))
                compile_s = time.perf_counter() - t_c0
                t0 = time.perf_counter()
                for _ in range(iters):
                    r = np.asarray(fn(x0, c, blocks))
                dt = (time.perf_counter() - t0) / iters
                print(json.dumps({
                    "mode": name, "Bt": tiles[0], "Tt": tiles[1],
                    "wall_s": round(dt, 4),
                    "samples_per_s": round(B * T / dt, 1),
                    "compile_s": round(compile_s, 1)}), flush=True)
            except Exception as e:
                print(json.dumps({
                    "mode": name, "Bt": tiles[0], "Tt": tiles[1],
                    "error": f"{type(e).__name__}: {str(e)[:160]}"}),
                    flush=True)


if __name__ == "__main__":
    main()
