#!/usr/bin/env python
"""One-command audio-quality regression net for ALL THREE output heads.

Runs scripts/synthetic_e2e.py (train a mid-size WaveNet on synthetic
harmonic tones with fixed seeds, then free-run generation from a held-out
mel) for the categorical mu-law-256, discretized-MoL and single-Gaussian
heads — the three reference recipes (egs/{mulaw256,mol,gaussian}) — and
requires every head to pass its loss-drop AND F0-tracking thresholds.

Kernel changes (fused train/generate Pallas work) must keep this green:
    python scripts/quality_check.py            # TPU, ~5 min/head
    python scripts/quality_check.py --steps 300  # quicker smoke
Exit code 0 iff all three heads PASS. One process end-to-end (plays nice
with the single-client compile relay).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import synthetic_e2e


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--heads", default="mulaw256,mol,gaussian")
    ap.add_argument("--fault", default="none",
                    help="inject a kernel fault (WN_FAULT) — use ONE head "
                         "per process for this (kernels cache at build "
                         "time); the run must then FAIL")
    args = ap.parse_args()

    results = {}
    for head in args.heads.split(","):
        print(f"\n===== head: {head} =====", flush=True)
        t0 = time.time()
        rc = synthetic_e2e.main(["--head", head, "--steps", str(args.steps),
                                 "--fault", args.fault])
        results[head] = (rc, time.time() - t0)

    print("\n===== quality summary =====")
    for head, (rc, dt) in results.items():
        print(f"{head}: {'PASS' if rc == 0 else 'FAIL'} ({dt:.0f}s)")
    return 0 if all(rc == 0 for rc, _ in results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
