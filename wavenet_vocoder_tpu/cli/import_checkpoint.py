"""Convert a reference PyTorch checkpoint to this framework's format.

    python -m wavenet_vocoder_tpu.cli.import_checkpoint TORCH_CKPT OUT_DIR \
        [--preset JSON] [--hparams "k=v,..."]

Reads a reference ``checkpoint_step*.pth`` (reference: train.py:852-884),
maps the torch state_dict onto our param pytree (see
``compat/torch_import.py``), and writes ``checkpoint_step{N:09d}.npz`` +
``checkpoint_latest.npz`` in OUT_DIR with the original step/epoch counters
preserved. If the reference's averaged-weights twin
(``..._ema.pth``) sits next to the input, it is imported as the EMA twin
stream automatically. The effective config is dumped as ``hparams.json``
next to the checkpoints (the reference's convention, train.py:1065-1067), so
``cli.evaluate``/``cli.synthesis`` auto-discover it.

The torch optimizer state is not converted (structurally tied to torch's
Adam); training resumes with a fresh optimizer, i.e. the reference's
``--reset-optimizer`` semantics.
"""
from __future__ import annotations

import argparse
import os
from types import SimpleNamespace

from wavenet_vocoder_tpu.compat.torch_import import (
    ema_twin_path,
    load_torch_checkpoint,
)
from wavenet_vocoder_tpu.config import discover_preset, load_config
from wavenet_vocoder_tpu.models.wavenet import spec_from_config
from wavenet_vocoder_tpu.training.checkpoint import (
    checkpoint_path,
    save_checkpoint,
)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("torch_ckpt", help="reference checkpoint_step*.pth")
    p.add_argument("out_dir", help="output checkpoint directory")
    p.add_argument("--preset", default=None,
                   help="preset JSON matching the checkpoint's model "
                        "(defaults to hparams.json beside the input)")
    p.add_argument("--hparams", default="", help='"k=v,..." overrides')
    args = p.parse_args(argv)

    preset = discover_preset(args.torch_ckpt, args.preset)
    if preset is not None and args.preset is None:
        print(f"Using config discovered next to checkpoint: {preset}")
    cfg = load_config(preset, args.hparams)
    spec = spec_from_config(cfg)

    params, counters = load_torch_checkpoint(args.torch_ckpt, spec)
    step = counters["global_step"]
    print(f"Imported {args.torch_ckpt}: step={step} "
          f"epoch={counters['global_epoch']}")

    # save_checkpoint writes the _ema twin stream itself whenever
    # state.ema_params is set (training/checkpoint.py:57-65)
    twin = ema_twin_path(args.torch_ckpt)
    ema_params = load_torch_checkpoint(twin, spec)[0] if twin else None
    state = SimpleNamespace(params=params, opt_state=None,
                            ema_params=ema_params)
    out = save_checkpoint(
        args.out_dir, state, global_step=step,
        global_epoch=counters["global_epoch"],
        global_test_step=counters["global_test_step"],
        save_optimizer_state=False)
    print(f"Wrote {out}")
    if twin is not None:
        print(f"Wrote EMA twin {checkpoint_path(args.out_dir, step, ema=True)}"
              f" (from {twin})")

    hp_out = os.path.join(args.out_dir, "hparams.json")
    with open(hp_out, "w") as f:
        f.write(cfg.to_json(indent=2, sort_keys=True))
    print(f"Wrote {hp_out}")


if __name__ == "__main__":
    main()
