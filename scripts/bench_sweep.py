"""One-process pallas synthesis sweep over (B, chunk, vmem) on the real TPU.

Amortizes the axon claim + relay compile cost across configs. Prints one JSON
line per config. Usage:
    python scripts/bench_sweep.py "256:64,256:128,256:256,128:128,128:512"
Each item is B:chunk[:vmem_mb].
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.models.wavenet import init_wavenet, spec_from_config
from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
from wavenet_vocoder_tpu.synthesis import pad_mel_context


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    cfg = Config()
    spec = spec_from_config(cfg)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    hop = cfg.hop_size
    seconds = float(os.environ.get("BENCH_SECONDS", 1.0))
    frames = int(seconds * cfg.sample_rate) // hop
    T = frames * hop
    rs = np.random.RandomState(0)
    n_iters = int(os.environ.get("BENCH_ITERS", 3))

    items = sys.argv[1].split(",") if len(sys.argv) > 1 else ["128:256"]
    for item in items:
        parts = item.split(":")
        B, chunk = int(parts[0]), int(parts[1])
        vmem = int(parts[2]) * 2**20 if len(parts) > 2 else None
        mel = rs.randn(B, frames, cfg.num_mels).astype(np.float32)
        c = jnp.asarray(pad_mel_context(mel, cfg.cin_pad))
        try:
            gen = PallasGenerator(params, spec, chunk=chunk,
                                  vmem_limit_bytes=vmem)
            est = gen.estimate_vmem_bytes(B)

            def run(key):
                s = gen(key, c=c, log_scale_min=cfg.log_scale_min)
                return np.asarray(s)  # force real completion (relay trap)

            t0 = time.perf_counter()
            run(jax.random.PRNGKey(0))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for i in range(n_iters):
                s = run(jax.random.PRNGKey(i + 1))
            dt = (time.perf_counter() - t0) / n_iters
            ok = bool(np.isfinite(s).all() and s.std() > 0.01)
            print(json.dumps({
                "B": B, "chunk": chunk, "vmem_mb": None if vmem is None
                else vmem // 2**20,
                "audio_sec_per_s": round(B * T / cfg.sample_rate / dt, 1),
                "us_per_step": round(dt / T * 1e6, 2),
                "est_vmem_mb": round(est / 2**20, 1),
                "compile_s": round(compile_s, 1), "ok": ok,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"B": B, "chunk": chunk,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
