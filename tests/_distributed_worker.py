"""Worker process for tests/test_distributed.py: joins a 2-process CPU
cluster via jax.distributed.initialize, trains a few steps data-parallel
over the global mesh, and writes {loss, checksum} JSON.

Run only via the parent test (needs coordinator/process flags)."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_cfg(fused: bool = False):
    from wavenet_vocoder_tpu.config import Config
    return Config(input_type="raw", quantize_channels=65536, out_channels=30,
                  layers=4, stacks=2, residual_channels=16, gate_channels=32,
                  skip_out_channels=24, cin_channels=8, batch_size=8,
                  upsample_conditional_features=False, dropout=0.0,
                  compute_dtype="", lr_schedule="", fused_train=fused,
                  exponential_moving_average=True)


def make_global_batch(B=8, T=96):
    rs = np.random.RandomState(0)
    x = rs.uniform(-0.5, 0.5, (B, T, 1)).astype(np.float32)
    return {"x": x, "y": x.copy(),
            "c": rs.randn(B, T, 8).astype(np.float32),
            "input_lengths": np.full(B, T, np.int32)}


def run_steps(state, step, batch, n=3):
    import jax
    for _ in range(n):
        state, m = step(state, batch, jax.random.PRNGKey(0))
    return state, float(m["loss"])


def checksum(tree):
    import jax
    import jax.numpy as jnp
    return float(sum(jnp.sum(jnp.abs(leaf))
                     for leaf in jax.tree.leaves(jax.device_get(tree))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--fused", action="store_true",
                    help="fused_train: the Pallas stack dispatched via "
                         "shard_map over the multi-host mesh")
    ap.add_argument("--train-loop-dump", default=None,
                    help="run the FULL train_loop over this dump dir "
                         "instead of raw steps (integration mode)")
    ap.add_argument("--checkpoint-dir", default=None)
    args = ap.parse_args()

    from wavenet_vocoder_tpu.parallel import (
        global_batch_from_local, initialize_distributed, make_mesh,
        replicate_global)
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)

    pid, n = initialize_distributed(coordinator_address=args.coordinator,
                                    num_processes=args.num_processes,
                                    process_id=args.process_id)
    import jax
    assert (pid, n) == (args.process_id, args.num_processes)

    if args.train_loop_dump:
        # integration mode: the REAL train_loop end-to-end — per-process
        # corpus shards, global-batch assembly, host-batch sanity check,
        # primary-only checkpoint/metric writes
        import dataclasses
        from wavenet_vocoder_tpu.training.loop import train_loop
        cfg = dataclasses.replace(
            make_cfg(fused=args.fused), cin_channels=-1, batch_size=4,
            max_time_steps=512, checkpoint_interval=2,
            train_eval_interval=10 ** 9, test_eval_epoch_interval=10 ** 9,
            num_workers=0, nepochs=50)
        state = train_loop(cfg, args.train_loop_dump, args.checkpoint_dir,
                           max_steps_override=2)
        with open(args.out, "w") as f:
            json.dump({"process": pid,
                       "final_step": int(jax.device_get(state.step)),
                       "global_devices": jax.device_count()}, f)
        return

    cfg = make_cfg(fused=args.fused)
    gb = make_global_batch(B=cfg.batch_size)
    B_loc = cfg.batch_size // n
    # global row layout follows device order = process order: this process
    # owns contiguous rows [pid*B_loc, (pid+1)*B_loc)
    local = {k: v[pid * B_loc:(pid + 1) * B_loc] for k, v in gb.items()}

    mesh = make_mesh({"data": jax.device_count()})
    state = replicate_global(create_train_state(cfg), mesh)
    batch = global_batch_from_local(local, mesh)
    step, _ = make_train_step(cfg, mesh=mesh if args.fused else None)
    state, loss = run_steps(state, step, batch)

    with open(args.out, "w") as f:
        json.dump({"loss": loss, "checksum": checksum(state.params),
                   "process": pid, "global_devices": jax.device_count()}, f)


if __name__ == "__main__":
    main()
