"""Time on-device log-mel extraction (XLA matmul-DFT vs fused Pallas kernel)
against the host numpy path. Run on TPU with the default env (axon relay);
forces device->host transfers for real wall times (see CLAUDE.md timing trap).
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

import numpy as np  # noqa: E402
import jax  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from wavenet_vocoder_tpu.config import Config  # noqa: E402
from wavenet_vocoder_tpu.dsp import audio  # noqa: E402
from wavenet_vocoder_tpu.dsp.mel_jax import (  # noqa: E402
    logmelspectrogram_jax, logmelspectrogram_pallas)


def timeit(fn, iters=20):
    np.asarray(fn())  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn())
    dt = (time.perf_counter() - t0) / iters
    return dt, out


def main():
    cfg = Config()
    seconds = float(os.environ.get("MEL_SECONDS", 30.0))
    T = int(seconds * cfg.sample_rate)
    rng = np.random.RandomState(0)
    x = (0.3 * np.sin(2 * np.pi * 440 * np.arange(T) / cfg.sample_rate)
         + 0.05 * rng.randn(T)).astype(np.float32)

    t0 = time.perf_counter()
    ref = audio.logmelspectrogram(x, cfg)
    host_dt = time.perf_counter() - t0

    xd = jax.device_put(x)
    dt_x, out_x = timeit(lambda: logmelspectrogram_jax(xd, cfg))
    err_x = np.max(np.abs(out_x - ref))
    print(f"host numpy : {host_dt*1e3:9.2f} ms  ({seconds:.0f}s audio, "
          f"{ref.shape[0]} frames)")
    print(f"XLA        : {dt_x*1e3:9.2f} ms  maxerr={err_x:.2e}  "
          f"({seconds/dt_x:,.0f}x realtime)")

    for f_blk in (64, 128, 256):
        try:
            dt_p, out_p = timeit(
                lambda: logmelspectrogram_pallas(xd, cfg, f_blk=f_blk))
            err_p = np.max(np.abs(out_p - ref))
            print(f"pallas f{f_blk:<4d}: {dt_p*1e3:9.2f} ms  "
                  f"maxerr={err_p:.2e}  ({seconds/dt_p:,.0f}x realtime)")
        except Exception as e:  # noqa: BLE001
            print(f"pallas f{f_blk}: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
