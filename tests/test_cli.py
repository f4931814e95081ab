"""End-to-end CLI tests: the full recipe flow (preprocess -> meanvar ->
normalize -> train -> synthesis -> evaluate) on a tiny corpus — the analogue
of exercising the reference's egs/*_demo presets (SURVEY.md section 4)."""
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    from scipy.io import wavfile
    sr = 16000
    wav_dir = root / "wavs"
    wav_dir.mkdir()
    rs = np.random.RandomState(0)
    for i in range(3):
        t = np.arange(sr + i * 1000) / sr
        x = 0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)
        x += 0.01 * rs.randn(len(t))
        wavfile.write(str(wav_dir / f"utt{i}.wav"), sr,
                      (x * 18000).astype(np.int16))
    preset = {
        "name": "wavenet_vocoder",
        "input_type": "mulaw-quantize", "quantize_channels": 256,
        "out_channels": 256, "sample_rate": sr, "fft_size": 512,
        "hop_size": 128, "win_length": 512, "num_mels": 20, "fmin": 60,
        "fmax": 7600, "cin_channels": 20, "cin_pad": 2,
        "max_time_steps": 1280, "upsample_conditional_features": True,
        "upsample_params": {"upsample_scales": [4, 4, 8]},
        "layers": 2, "stacks": 1, "residual_channels": 8,
        "gate_channels": 8, "skip_out_channels": 8, "batch_size": 2,
        "compute_dtype": "", "lr_schedule": "",
        "checkpoint_interval": 1000, "train_eval_interval": 1000,
        "num_workers": 0,
    }
    preset_path = root / "preset.json"
    preset_path.write_text(json.dumps(preset))

    # run the preprocessing CLIs once here so every test below is
    # independently runnable (no inter-test ordering coupling)
    from wavenet_vocoder_tpu.cli.preprocess import main as pp
    from wavenet_vocoder_tpu.cli.compute_meanvar_stats import main as mv
    from wavenet_vocoder_tpu.cli.preprocess_normalize import main as norm
    dump = str(root / "dump" / "train_no_dev")
    pp(["wavallin", str(wav_dir), dump,
        "--preset", str(preset_path), "--num-workers", "1"])
    scaler = str(root / "meanvar.npz")
    mv([dump, scaler])
    norm([dump, str(root / "norm" / "train_no_dev"), scaler,
          "--num-workers", "1"])

    return {"root": root, "wav_dir": str(wav_dir),
            "preset": str(preset_path), "sr": sr}


def test_preprocess_cli_outputs(workdir):
    dump = str(workdir["root"] / "dump" / "train_no_dev")
    assert os.path.exists(os.path.join(dump, "train.txt"))


def test_meanvar_and_normalize_cli_outputs(workdir):
    out = str(workdir["root"] / "norm" / "train_no_dev")
    assert os.path.exists(os.path.join(out, "train.txt"))
    assert os.path.exists(str(workdir["root"] / "meanvar.npz"))


@pytest.fixture(scope="module")
def trained(workdir):
    from wavenet_vocoder_tpu.cli.train import main
    ckpt_dir = str(workdir["root"] / "exp")
    main(["--dump-root", str(workdir["root"] / "norm"),
          "--checkpoint-dir", ckpt_dir,
          "--preset", workdir["preset"],
          "--max-train-steps", "3", "--no-mesh"])
    return ckpt_dir


def test_train_cli(workdir, trained):
    ckpt_dir = trained
    assert os.path.exists(os.path.join(ckpt_dir, "hparams.json"))
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_latest.npz"))
    assert os.path.exists(os.path.join(ckpt_dir, "checkpoint_latest_ema.npz"))
    # metrics written
    logdir = os.path.join(ckpt_dir, "log")
    assert any("metrics" in f or "events" in f for f in os.listdir(logdir))


def test_train_cli_resume(workdir, trained):
    from wavenet_vocoder_tpu.cli.train import main
    ckpt_dir = trained
    latest = os.path.join(ckpt_dir, "checkpoint_latest.npz")
    main(["--dump-root", str(workdir["root"] / "norm"),
          "--checkpoint-dir", ckpt_dir,
          "--preset", workdir["preset"],
          "--checkpoint", latest,
          "--max-train-steps", "5", "--no-mesh"])
    from wavenet_vocoder_tpu.training import checkpoint as ckpt_lib
    assert ckpt_lib.load_params(latest).counters["global_step"] == 5


def test_synthesis_cli(workdir, trained):
    from wavenet_vocoder_tpu.cli.synthesis import main
    from glob import glob
    ckpt = os.path.join(trained, "checkpoint_latest_ema.npz")
    mel = sorted(glob(str(workdir["root"] / "norm" / "train_no_dev"
                          / "*-feats.npy")))[0]
    dst = str(workdir["root"] / "syn.wav")
    # no --preset: hparams.json is auto-discovered next to the checkpoint
    # (reference: evaluate.py:120-124)
    main([ckpt, dst, "--conditional", mel])
    from scipy.io import wavfile
    sr, x = wavfile.read(dst)
    assert sr == workdir["sr"]
    n_frames = np.load(mel).shape[0]
    assert len(x) == n_frames * 128


def test_synthesis_cli_unconditional(workdir, trained):
    """--length/--initial-value path (reference: synthesis.py:10-12,
    147-161)."""
    from wavenet_vocoder_tpu.cli.synthesis import main
    dst = str(workdir["root"] / "syn_uncond.wav")
    ckpt = os.path.join(trained, "checkpoint_latest.npz")
    main([ckpt, dst, "--length", "640", "--initial-value", "127",
          "--hparams", "cin_channels=-1"])
    from scipy.io import wavfile
    sr, x = wavfile.read(dst)
    assert len(x) == 640


def test_evaluate_cli(workdir, trained):
    from wavenet_vocoder_tpu.cli.evaluate import main
    ckpt = os.path.join(trained, "checkpoint_latest_ema.npz")
    out = str(workdir["root"] / "generated")
    main([str(workdir["root"] / "norm" / "train_no_dev"), ckpt, out,
          "--num-utterances", "2", "--batch-size", "2",
          # reference-compat flags (evaluate.py:10-15) must be accepted
          "--length", "32000", "--initial-value", "0.0",
          "--output-html", "--verbose", "1"])
    files = os.listdir(out)
    gens = [f for f in files if f.endswith("_gen.wav")]
    refs = [f for f in files if f.endswith("_ref.wav")]
    assert len(gens) == 2 and len(refs) == 2


def test_evaluate_cli_mesh(workdir, trained, tmp_path):
    """--mesh shards utterance batches over the 8 virtual devices; a batch
    smaller than the device count is replicate-padded and trimmed."""
    from wavenet_vocoder_tpu.cli.evaluate import main
    ckpt = os.path.join(trained, "checkpoint_latest_ema.npz")
    out = str(tmp_path / "generated_mesh")
    main([str(workdir["root"] / "norm" / "train_no_dev"), ckpt, out,
          "--num-utterances", "3", "--batch-size", "3", "--mesh"])
    gens = [f for f in os.listdir(out) if f.endswith("_gen.wav")]
    assert len(gens) == 3


def test_tojson_cli(workdir, tmp_path):
    from wavenet_vocoder_tpu.cli.tojson import main
    out = str(tmp_path / "dump.json")
    main([out, "--hparams", "layers=6,stacks=2"])
    d = json.loads(open(out).read())
    assert d["layers"] == 6 and d["name"] == "wavenet_vocoder"


def test_graft_entry():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as ge
    import jax
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[-1] == 30  # MoL head
    ge.dryrun_multichip(8)


def test_evaluate_cli_mel_only(workdir, trained, tmp_path):
    """Feats-only dir (no *-wave.npy): synthesize from features alone,
    no ref wavs (reference: evaluate.py:51-78 dummy_collate mode)."""
    import shutil
    from glob import glob
    from wavenet_vocoder_tpu.cli.evaluate import main
    mel_dir = str(tmp_path / "mel_only")
    os.makedirs(mel_dir)
    for f in glob(str(workdir["root"] / "norm" / "train_no_dev"
                      / "*-feats.npy"))[:2]:
        shutil.copy(f, mel_dir)
    ckpt = os.path.join(trained, "checkpoint_latest_ema.npz")
    out = str(tmp_path / "gen_mel_only")
    main([mel_dir, ckpt, out, "--batch-size", "2"])
    files = os.listdir(out)
    assert len([f for f in files if f.endswith("_gen.wav")]) == 2
    assert not any(f.endswith("_ref.wav") for f in files)
