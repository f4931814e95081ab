"""Compiled-on-hardware validation of the Pallas serving engine.

The CPU test suite proves engine equivalence in interpret mode; this script
re-proves the same invariants with the REAL Mosaic-compiled kernels on a TPU
chip (run it whenever the kernel changes):

  1. fused kernel == scan decoder, categorical head: sample codes agree
     except argmax near-ties (TPU f32 matmuls are lowered independently by
     Mosaic and XLA; with RANDOM weights the 256-way logits near-tie and
     AR feedback amplifies a flip — measured 0.02% flips at default XLA
     precision, and 1.5% at precision=highest, i.e. the kernel numerics sit
     exactly at XLA's default lowering. CPU interpret mode proves the exact
     math identity; tests/test_reference_oracle.py proves it against torch.)
  2. streamed segments (carry kernel) == one offline call — deterministic
     AND sampled (the on-core PRNG is keyed by absolute chunk index)
  3. auto batch split == unsplit
  4. 1-device mesh shard_map dispatch == direct dispatch

Usage:  python scripts/tpu_validate.py          (takes a few minutes: each
distinct kernel shape is one Mosaic compile through whatever compile path
the host has)
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np


def wait_for_device(retries: int = 30, delay: float = 20.0) -> None:
    """A previously killed TPU process's claim can take minutes to clear."""
    for i in range(retries):
        try:
            np.asarray(jnp.zeros(1) + 1)
            return
        except Exception as e:  # noqa: BLE001
            print(f"# device claim retry {i}: {type(e).__name__}",
                  file=sys.stderr)
            time.sleep(delay)
    raise SystemExit("device never became available")


def main() -> int:
    wait_for_device()
    from wavenet_vocoder_tpu.models.wavenet import WaveNetSpec, init_wavenet
    from wavenet_vocoder_tpu.ops.generate import generate
    from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator

    spec = WaveNetSpec(out_channels=30, layers=4, stacks=2,
                       residual_channels=64, gate_channels=128,
                       skip_out_channels=64, cin_channels=16,
                       scalar_input=True, output_distribution="Logistic")
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    B, T = 8, 512
    c = jax.random.normal(jax.random.PRNGKey(1), (B, T, 16))
    rng = jax.random.PRNGKey(2)
    failures = []

    def check(name, ok):
        print(f"{'PASS' if ok else 'FAIL'}  {name}", flush=True)
        if not ok:
            failures.append(name)

    # f32 weights so the scan comparison is apples-to-apples
    gen = PallasGenerator(params, spec, weight_dtype=jnp.float32, chunk=128)

    t0 = time.time()
    pal = np.asarray(gen(rng, c=c, deterministic=True))
    print(f"# fused kernel compiled+ran in {time.time() - t0:.1f}s",
          flush=True)

    # cross-engine on hardware: categorical codes, near-tie flips tolerated
    # (see module docstring; the MoL head's argmax-over-10-mixtures is
    # maximally tie-prone with random weights, so the categorical head is
    # the meaningful hardware oracle)
    spec_cat = WaveNetSpec(out_channels=256, layers=4, stacks=2,
                           residual_channels=64, gate_channels=128,
                           skip_out_channels=64, cin_channels=16,
                           scalar_input=False)
    p_cat = init_wavenet(jax.random.PRNGKey(3), spec_cat)
    gen_cat = PallasGenerator(p_cat, spec_cat, weight_dtype=jnp.float32,
                              chunk=128)
    codes_p = np.asarray(gen_cat(rng, c=c, deterministic=True))
    codes_s = np.argmax(np.asarray(
        generate(p_cat, spec_cat, rng, c=c,
                 deterministic=True)["samples"]), -1)
    flips = float((codes_p != codes_s).mean())
    print(f"# cross-engine code agreement: {(1 - flips) * 100:.3f}%",
          flush=True)
    check("pallas == scan (categorical, <0.5% near-tie flips)",
          flips < 0.005)

    # streaming carry: deterministic and sampled
    s1, st = gen(rng, c=c[:, :256], deterministic=True, return_state=True)
    s2 = gen(rng, c=c[:, 256:], deterministic=True, state=st)
    stream = np.concatenate([np.asarray(s1), np.asarray(s2)], axis=1)
    check("streamed == offline (deterministic)",
          np.allclose(pal, stream, atol=1e-5))

    off_s = np.asarray(gen(jax.random.PRNGKey(5), c=c))
    a1, st2 = gen(jax.random.PRNGKey(5), c=c[:, :256], return_state=True)
    a2 = gen(jax.random.PRNGKey(5), c=c[:, 256:], state=st2)
    check("streamed == offline (sampled, on-core PRNG)",
          np.array_equal(off_s,
                         np.concatenate([np.asarray(a1), np.asarray(a2)],
                                        axis=1)))

    # auto batch split
    split_gen = PallasGenerator(params, spec, weight_dtype=jnp.float32,
                                chunk=128,
                                vmem_limit_bytes=gen.estimate_vmem_bytes(8))
    c16 = jax.random.normal(jax.random.PRNGKey(6), (16, 256, 16))
    whole = np.asarray(gen(rng, c=c16, deterministic=True))
    parts = np.asarray(split_gen(rng, c=c16, deterministic=True))
    check("auto batch split == unsplit", np.array_equal(whole, parts))

    # 1-device mesh dispatch
    from wavenet_vocoder_tpu.parallel import make_mesh
    mesh = make_mesh({"data": 1}, devices=jax.devices()[:1])
    mgen = PallasGenerator(params, spec, weight_dtype=jnp.float32,
                           chunk=128, mesh=mesh)
    meshed = np.asarray(mgen(rng, c=c, deterministic=True))
    check("mesh shard_map dispatch == direct", np.array_equal(pal, meshed))

    print(f"\n{'ALL PASS' if not failures else 'FAILURES: ' + str(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
