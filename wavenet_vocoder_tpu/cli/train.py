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
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
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
