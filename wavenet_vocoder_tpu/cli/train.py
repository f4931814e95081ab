"""Training CLI (reference: train.py:1-16 docopt usage).

    python -m wavenet_vocoder_tpu.cli.train --dump-root DIR --checkpoint-dir DIR \
        [--preset JSON] [--hparams "k=v,..."] [--checkpoint PATH] \
        [--restore-parts PATH] [--reset-optimizer] [--speaker-id N] \
        [--log-event-path DIR] [--max-train-steps N]
"""
from __future__ import annotations

import argparse

from wavenet_vocoder_tpu.config import config_debug_string, load_config
from wavenet_vocoder_tpu.training.loop import train_loop


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dump-root", "--data-root", dest="dump_root",
                   required=True, help="directory with train_no_dev/ dev/ dumps")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--preset", default=None, help="preset JSON path")
    p.add_argument("--hparams", default="", help='"k=v,..." overrides')
    p.add_argument("--checkpoint", default=None, help="resume checkpoint")
    p.add_argument("--restore-parts", default=None,
                   help="partial restore for fine-tuning")
    p.add_argument("--reset-optimizer", action="store_true")
    p.add_argument("--speaker-id", type=int, default=None)
    p.add_argument("--log-event-path", default=None)
    p.add_argument("--max-train-steps", type=int, default=None)
    p.add_argument("--no-mesh", action="store_true",
                   help="disable multi-device data parallelism")
    # multi-host bring-up (SURVEY.md sections 2.4/5.8: DCN across hosts —
    # the TPU equivalent of the reference's DataParallel, train.py:676-689).
    # On TPU pods --distributed alone autodetects everything; off-TPU pass
    # all three explicit flags.
    p.add_argument("--distributed", action="store_true",
                   help="join a multi-host cluster "
                        "(jax.distributed.initialize autodetect)")
    p.add_argument("--coordinator-address", default=None,
                   help="host:port of process 0 (implies --distributed)")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    if (args.distributed or args.coordinator_address is not None
            or args.num_processes is not None
            or args.process_id is not None):
        from wavenet_vocoder_tpu.parallel import initialize_distributed
        pid, n = initialize_distributed(
            coordinator_address=args.coordinator_address,
            num_processes=args.num_processes,
            process_id=args.process_id)
        print(f"distributed: process {pid}/{n}")
    cfg = load_config(args.preset, args.hparams)
    print(config_debug_string(cfg))
    train_loop(
        cfg, args.dump_root, args.checkpoint_dir,
        log_event_path=args.log_event_path,
        restore_checkpoint=args.checkpoint,
        restore_parts_path=args.restore_parts,
        reset_optimizer=args.reset_optimizer,
        speaker_id=args.speaker_id,
        max_steps_override=args.max_train_steps,
        use_mesh=not args.no_mesh,
    )


if __name__ == "__main__":
    main()
