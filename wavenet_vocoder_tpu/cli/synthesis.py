"""Single-utterance synthesis CLI (reference: synthesis.py docopt usage).

    python -m wavenet_vocoder_tpu.cli.synthesis CHECKPOINT DST_WAV \
        [--conditional MEL_NPY] [--length T] [--initial-value V] \
        [--preset JSON] [--hparams "k=v"] [--speaker-id N] [--seed N]

Unconditional generation (no mel) follows the reference's --length /
--initial-value semantics (reference: synthesis.py:10-12, 148-162).
"""
from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np

from wavenet_vocoder_tpu.config import Config, discover_preset, load_config
from wavenet_vocoder_tpu.dsp import audio
from wavenet_vocoder_tpu.synthesis import wavegen
from wavenet_vocoder_tpu.training import checkpoint as ckpt_lib


def load_params_and_config(checkpoint_path: str, preset, hparams_str):
    """Load checkpoint params + config, auto-discovering hparams.json next to
    the checkpoint when no preset is given (reference: evaluate.py:116-127).

    Handles both the npz checkpoint format and legacy pickle files; the
    params pytree is rebuilt exactly as saved (so e.g. a ``cin_channels=-1``
    override simply leaves the conditioning weights unused, like the
    reference's strict=False-style loading)."""
    preset = discover_preset(checkpoint_path, preset)
    cfg = load_config(preset, hparams_str)
    payload = ckpt_lib.load_params(checkpoint_path)
    params = ckpt_lib.params_tree(payload)
    return params, cfg, payload.counters["global_step"]


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("checkpoint")
    p.add_argument("dst_wav")
    p.add_argument("--conditional", "--mel", dest="mel", default=None,
                   help="(T, D) mel-spectrogram .npy; omit for "
                        "unconditional generation")
    p.add_argument("--length", type=int, default=32000,
                   help="steps to generate when unconditional "
                        "(reference: synthesis.py:10)")
    p.add_argument("--initial-value", type=float, default=None,
                   help="initial decoder input (raw float, or mu-law code "
                        "for categorical models; reference: "
                        "synthesis.py:148-162)")
    p.add_argument("--preset", default=None)
    p.add_argument("--hparams", default="")
    p.add_argument("--speaker-id", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--file-name-suffix", default="",
                   help="appended to the wav name when DST_WAV is a "
                        "directory (reference: synthesis.py:203, 240)")
    p.add_argument("--output-html", action="store_true",
                   help="print an <audio> html snippet for the generated wav "
                        "(reference: synthesis.py:204)")
    p.add_argument("--engine", default="auto",
                   choices=("auto", "scan", "pallas"),
                   help="decoder engine: auto = pallas (fused TPU kernel) "
                        "on TPU backends, scan elsewhere")
    args = p.parse_args(argv)
    if args.engine == "auto":
        args.engine = ("pallas" if jax.default_backend() in ("tpu", "axon")
                       else "scan")

    params, cfg, step = load_params_and_config(
        args.checkpoint, args.preset, args.hparams)
    c = None if args.mel is None else np.load(args.mel)
    what = ("unconditional" if c is None
            else f"{c.shape[0]} mel frames")
    print(f"Synthesizing {what} with step-{step} model...")
    wav = wavegen(params, cfg, c=c, g=args.speaker_id,
                  length=None if c is not None else args.length,
                  initial_value=args.initial_value,
                  rng=jax.random.PRNGKey(args.seed), engine=args.engine)
    dst = args.dst_wav
    if os.path.isdir(dst):
        # directory destination: name after the checkpoint, like the
        # reference's dst_dir mode (reference: synthesis.py:240)
        name = os.path.splitext(os.path.basename(args.checkpoint))[0]
        dst = os.path.join(dst, f"{name}{args.file_name_suffix}.wav")
    audio.save_wav(wav, dst, cfg.sample_rate)
    print(f"Wrote {dst} ({len(wav) / cfg.sample_rate:.2f}s)")
    if args.output_html:
        print(f'<audio controls="controls"><source src="{dst}"/></audio>')


if __name__ == "__main__":
    main()
