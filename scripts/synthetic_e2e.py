#!/usr/bin/env python
"""End-to-end quality validation on synthetic audio.

Builds a corpus of harmonic tones with per-utterance F0, trains a mid-size
WaveNet conditioned on log-mel until the loss drops well below the
unconditional entropy, then free-runs generation from a HELD-OUT utterance's
mel and checks the generated waveform's dominant frequency matches that
utterance's F0 — i.e. the model actually uses its conditioning.

Covers all three output heads of the reference recipes (egs/{mulaw256,mol,
gaussian}; reference: hparams.py:20-21, 51-52): --head selects the
categorical mu-law-256 head, the discretized-mixture-of-logistics head on
raw audio, or the single-Gaussian (ClariNet-teacher) head.

This is the closest available stand-in for perceptual validation in a
zero-egress environment with no speech corpus. Run on TPU:
    python scripts/synthetic_e2e.py [--steps N] [--head mulaw256|mol|gaussian]
"""
import argparse
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/jax_comp_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def make_utterance(f0: float, sr: int, seconds: float, rs) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros_like(t)
    for h, amp in ((1, 1.0), (2, 0.5), (3, 0.25)):
        x += amp * np.sin(2 * np.pi * f0 * h * t + rs.uniform(0, 6.28))
    # slow amplitude modulation so mels vary over time
    x *= 0.35 * (0.6 + 0.4 * np.sin(2 * np.pi * 2.0 * t))
    return x.astype(np.float32)


def dominant_f0(x: np.ndarray, sr: int) -> float:
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    freqs = np.fft.rfftfreq(len(x), 1 / sr)
    lo = freqs > 60
    return float(freqs[lo][np.argmax(spec[lo])])


def mel_correlation(mel_a: np.ndarray, mel_b: np.ndarray,
                    trim: int = 4) -> float:
    """Mean per-frame Pearson correlation between two log-mel spectrograms
    (frames trimmed to skip generator warm-up). Chosen over L2/MCD-style
    distance because sampled audio has a broadband noise floor (~-3 log10
    per bin from the output distribution) that clean synthetic tones lack
    (floor -10): absolute distances measure the noise floor, correlation
    measures the harmonic STRUCTURE. Calibrated on v5e r5 wavs: a healthy
    MoL generation scores ~0.95 vs its target and BELOW that vs every
    wrong-F0 decoy, while a broken rollout (4th-harmonic lock) scores ~0.5
    and correlates better with decoys than with its own target."""
    n = min(mel_a.shape[0], mel_b.shape[0]) - trim
    a, b = mel_a[trim:n], mel_b[trim:n]
    a = a - a.mean(axis=1, keepdims=True)
    b = b - b.mean(axis=1, keepdims=True)
    num = (a * b).sum(axis=1)
    den = np.sqrt((a * a).sum(axis=1) * (b * b).sum(axis=1)) + 1e-9
    return float(np.mean(num / den))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--sr", type=int, default=16000)
    ap.add_argument("--head", default="mulaw256",
                    choices=("mulaw256", "mol", "gaussian"))
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--f0-tol", type=float, default=0.05,
                    help="relative F0-tracking tolerance (r4 ran at 0.15; "
                         "tightened per VERDICT r4 #4)")
    ap.add_argument("--mel-corr", type=float, default=None,
                    help="minimum mean per-frame log-mel correlation of the "
                         "generated audio vs the held-out target; default "
                         "per-head (v5e calibration: mol 0.952 / gaussian "
                         "~0.93 / mulaw256 0.892 healthy vs ~0.53 broken — "
                         "the 256-way categorical samples audibly noisier, "
                         "so its ceiling sits lower)")
    ap.add_argument("--fault", default="none",
                    choices=("none", "bwd_mask_tshift", "bwd_bnd_roll"),
                    help="inject a deliberate kernel fault (sets WN_FAULT "
                         "for the fused backward) to prove the net FAILS on "
                         "a subtle gradient bug; see ops/pallas_train.py")
    # production paths by default: the fused residual-stack TRAIN kernel
    # (ops/pallas_train.py) and the fused pallas GENERATION kernel — so
    # kernel changes are what this check validates. --xla flips both to
    # the XLA scan/conv paths for A/B.
    ap.add_argument("--xla", action="store_true",
                    help="use the XLA train path + scan generation engine")
    args = ap.parse_args(argv)
    if args.fault == "bwd_mask_tshift" and args.head == "mulaw256":
        # the mask fault only perturbs the dropout branch, and mulaw256
        # trains at dropout 0.0 — the run would be a silent no-op PASS
        raise SystemExit(
            "--fault bwd_mask_tshift needs a dropout>0 head (mol/gaussian);"
            " mulaw256 trains at dropout 0.0 — use bwd_bnd_roll instead")
    if args.fault != "none":
        os.environ["WN_FAULT"] = args.fault
        print(f"FAULT INJECTION: WN_FAULT={args.fault} "
              "(this run is EXPECTED to fail)")

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.dsp import audio as dsp
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    from wavenet_vocoder_tpu.ops.mulaw import mulaw_quantize
    from wavenet_vocoder_tpu.synthesis import batch_wavegen, pad_mel_context
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)

    sr = args.sr
    # head-specific keys mirror the three reference recipes
    # (egs/{mulaw256,mol,gaussian}/conf; reference: hparams.py:20-21, 51-52)
    # dropout per head: mol/gaussian train with the reference WaveNet class
    # default 0.05 (wavenet.py:102) — this exercises the fused kernels'
    # counter-based mask end-to-end and makes the bwd_mask_tshift fault
    # injectable — while mulaw256 matches its reference recipe's 0.0
    # (egs/mulaw256 conf): measured on v5e, the 256-way categorical rollout
    # needs the lower teacher-forced NLL (0.89 vs 1.16 nats at 1500 steps)
    # or free-running locks onto a harmonic (892Hz vs the 220Hz target,
    # identically under f32 and bf16 GLU).
    head_cfg = {
        "mulaw256": dict(input_type="mulaw-quantize", quantize_channels=256,
                         out_channels=256, dropout=0.0),
        "mol": dict(input_type="raw", quantize_channels=65536,
                    out_channels=10 * 3, output_distribution="Logistic",
                    log_scale_min=-16.0, dropout=0.05),
        "gaussian": dict(input_type="raw", quantize_channels=65536,
                         out_channels=2, output_distribution="Normal",
                         log_scale_min=-16.0, dropout=0.05),
    }[args.head]
    cfg = Config(
        sample_rate=sr, fft_size=512, hop_size=128, win_length=512,
        num_mels=40, fmin=60, fmax=7600, cin_channels=40, cin_pad=2,
        layers=12, stacks=2, residual_channels=64, gate_channels=128,
        skip_out_channels=64, max_time_steps=4096,
        upsample_conditional_features=True,
        upsample_params={"upsample_scales": [4, 4, 8]},
        batch_size=8, lr_schedule="", fused_train=not args.xla,
        optimizer_params={"lr": args.lr, "eps": 1e-8, "weight_decay": 0.0},
        **head_cfg)
    spec = spec_from_config(cfg)
    print(f"model: {cfg.layers}L/{cfg.stacks}S r{cfg.residual_channels} "
          f"rf={spec.receptive_field} head={args.head}", flush=True)

    # corpus: 8 train F0s + 1 held-out
    rs = np.random.RandomState(0)
    f0s = [110, 147, 196, 220, 262, 330, 392, 440]
    # held-out UTTERANCE at a trained F0 (new phases/content; tests
    # conditioning use without asking for F0 interpolation)
    f0_test = 220.0
    mu = cfg.quantize_channels - 1
    hop = cfg.hop_size

    scalar = cfg.is_scalar_input

    def featurize(wav):
        mel = dsp.logmelspectrogram(wav, cfg)
        if scalar:
            target = np.clip(wav, -1, 1).astype(np.float32)
        else:
            target = mulaw_quantize(np.clip(wav, -1, 1), mu)
        n = min(len(target) // hop, mel.shape[0])
        return target[:n * hop], mel[:n]

    train_data = [featurize(make_utterance(f, sr, 2.0, rs)) for f in f0s]
    test_wav = make_utterance(f0_test, sr, 1.5, np.random.RandomState(99))
    _, test_mel = featurize(test_wav)

    # fixed crops per step, drawn randomly
    T = cfg.max_time_steps
    frames = T // hop
    eye = np.eye(256, dtype=np.float32)

    def sample_batch(step_rs):
        xs, ys, cs = [], [], []
        for _ in range(cfg.batch_size):
            target, mel = train_data[step_rs.randint(len(train_data))]
            max_s = mel.shape[0] - frames - cfg.cin_pad
            s = step_rs.randint(cfg.cin_pad, max_s)
            seg = target[s * hop:(s + frames) * hop]
            if scalar:
                xs.append(seg[:, None])
                ys.append(seg[:, None])
            else:
                xs.append(eye[seg])
                ys.append(seg)
            cs.append(mel[s - cfg.cin_pad:s + frames + cfg.cin_pad])
        y = np.stack(ys)
        return {"x": np.stack(xs).astype(np.float32),
                "y": y.astype(np.float32) if scalar else y.astype(np.int32),
                "c": np.stack(cs).astype(np.float32),
                "input_lengths": np.full(cfg.batch_size, T, np.int32)}

    state = create_train_state(cfg)
    step_fn, _ = make_train_step(cfg, spec)
    key = jax.device_put(jax.random.PRNGKey(0))
    srs = np.random.RandomState(1)

    # Pre-stage a pool of batches ON DEVICE: per-step host->device transfers
    # through this environment's relay would dominate the step time. A pool
    # of random crops cycled in random order is statistically equivalent for
    # this overfit-style check.
    pool = [jax.device_put(sample_batch(srs)) for _ in range(24)]
    print(f"staged {len(pool)} device batches", flush=True)

    t0 = time.time()
    first = None
    for i in range(args.steps):
        state, m = step_fn(state, pool[srs.randint(len(pool))], key)
        if i % 200 == 0 or i == args.steps - 1:
            loss = float(m["loss"])
            first = first if first is not None else loss
            print(f"step {i}: loss {loss:.3f} "
                  f"({(i + 1) / (time.time() - t0):.1f} steps/s)", flush=True)
    final_loss = float(m["loss"])

    # generate with the trained params (NOT the EMA shadow: at decay 0.9999
    # and only a few thousand steps the EMA is still mostly the random init —
    # the reference's EMA is meant for 100k+ step runs).
    # THREE independent rollouts in one batched call (per-row PRNG streams):
    # the free-running sampler is chaotic — ulp-level kernel-numerics
    # differences legitimately reroute a single trajectory (observed r5:
    # the same trained mulaw256 model tracked 217Hz under one GLU lowering
    # and flipped to a 335Hz trajectory under another) — so the net scores
    # the BEST rollout. A genuinely broken model/kernel breaks ALL of them
    # (the injected-fault run fails every rollout).
    params = jax.device_get(state.params)
    n_roll = 3
    c = pad_mel_context(
        np.repeat(test_mel[None].astype(np.float32), n_roll, axis=0),
        cfg.cin_pad)
    engine = "scan" if args.xla else "pallas"
    wavs = batch_wavegen(params, cfg, spec=spec, c=c, engine=engine,
                         rng=jax.random.PRNGKey(42))

    f0_ref = dominant_f0(test_wav, sr)
    # spectral check (VERDICT r4 #4): the generated waveform's log-mel must
    # CORRELATE with the HELD-OUT conditioning target, and more strongly
    # than with every decoy (other F0s from the training set) — a relative
    # margin that catches broadband/harmonic corruption F0 tracking misses.
    # The metric runs at its own finer resolution (128 mels / 1024 fft) so
    # neighboring-F0 harmonic ladders separate.
    mcfg = Config(sample_rate=sr, fft_size=1024, hop_size=cfg.hop_size,
                  win_length=1024, num_mels=128, fmin=60, fmax=7600)
    target_m = dsp.logmelspectrogram(test_wav, mcfg)
    decoys = [f for f in f0s if abs(f - f0_test) > 30]
    decoy_m = [dsp.logmelspectrogram(
        make_utterance(f, sr, 1.5, np.random.RandomState(7)), mcfg)
        for f in decoys]
    mel_corr_min = (args.mel_corr if args.mel_corr is not None
                    else {"mulaw256": 0.85, "mol": 0.90,
                          "gaussian": 0.90}[args.head])
    per_roll = []
    for wav_i in wavs:
        m = dsp.logmelspectrogram(wav_i, mcfg)
        corr = mel_correlation(m, target_m)
        f0_i = dominant_f0(wav_i[2000:], sr)
        margin = corr - max(mel_correlation(m, dm) for dm in decoy_m)
        ok = (abs(f0_i - f0_ref) < args.f0_tol * f0_ref
              and corr >= mel_corr_min and margin > 0)
        per_roll.append((ok, corr, f0_i, margin, wav_i))
    print("rollouts: " + ", ".join(
        f"corr {c:.3f}/F0 {f:.0f}Hz/margin {mg:+.3f}"
        f"{' OK' if ok else ''}" for ok, c, f, mg, _ in per_roll))
    # a healthy model has at least one fully-passing rollout; a broken
    # model/kernel (or injected fault) has none. Report the best passing
    # rollout, else the max-corr one.
    passing = [r for r in per_roll if r[0]]
    _, c_ref, f0_gen, c_margin, wav = (
        max(passing, key=lambda r: r[1]) if passing
        else max(per_roll, key=lambda r: r[1]))
    print(f"\nloss: {first:.3f} -> {final_loss:.3f}")
    print(f"held-out F0: reference {f0_ref:.1f} Hz, generated {f0_gen:.1f} Hz "
          f"({abs(f0_gen - f0_ref) / f0_ref * 100:.1f}% off)")
    print(f"log-mel correlation: to target {c_ref:.3f} "
          f"(margin over best decoy {c_margin:+.3f})")
    out_wav = f"/tmp/synthetic_e2e_{args.head}_gen.wav"
    dsp.save_wav(wav, out_wav, sr)
    print(f"wrote {out_wav}")

    if args.head == "mol":
        # discretized NLL over 64k bins: absolute drop, floor isn't near zero
        ok_loss = final_loss < first - 2.0
    elif args.head == "gaussian":
        # continuous NLL, starts near 0.5*log(2*pi*var) and goes negative as
        # the predicted scales shrink on near-deterministic tones
        ok_loss = final_loss < first - 1.0
    else:
        ok_loss = final_loss < first * 0.5
    ok_f0 = abs(f0_gen - f0_ref) < args.f0_tol * f0_ref
    # calibrated on v5e @1500 steps (docs/VALIDATION.md r5 record):
    # healthy generations score 0.88-0.95 target-correlation with positive
    # decoy margin; a corrupted rollout scores ~0.3-0.5 with NEGATIVE margin
    ok_mel = c_ref >= mel_corr_min and c_margin > 0
    import json as _json
    print(_json.dumps({"head": args.head, "loss_first": round(first, 3),
                       "loss_final": round(final_loss, 3),
                       "f0_ref": round(f0_ref, 1),
                       "f0_gen": round(f0_gen, 1),
                       "mel_corr": round(c_ref, 3),
                       "mel_margin": round(c_margin, 3),
                       "fault": args.fault}))
    print(f"loss-drop check: {'PASS' if ok_loss else 'FAIL'}; "
          f"F0-tracking check ({args.f0_tol:.0%}): "
          f"{'PASS' if ok_f0 else 'FAIL'}; "
          f"log-mel check (corr>={mel_corr_min}, margin>0): "
          f"{'PASS' if ok_mel else 'FAIL'}")
    return 0 if (ok_loss and ok_f0 and ok_mel) else 1


if __name__ == "__main__":
    sys.exit(main())
