"""Multi-speaker (global conditioning) end-to-end: 5-field manifest ->
dataset -> collate with speaker ids -> train step -> per-speaker evaluate
outputs (reference: train.py:180-183 manifest, evaluate.py:173-220)."""
import os

import numpy as np
import jax
import pytest

from wavenet_vocoder_tpu.config import Config
from wavenet_vocoder_tpu.data import WaveNetDataset, collate_fn
from wavenet_vocoder_tpu.training.train_state import (
    create_train_state,
    make_train_step,
    sanity_check,
)

CFG = Config(input_type="mulaw-quantize", quantize_channels=256,
             out_channels=256, sample_rate=16000, fft_size=512, hop_size=128,
             win_length=512, num_mels=16, fmin=60, fmax=7600,
             cin_channels=16, cin_pad=1, max_time_steps=768,
             upsample_conditional_features=True,
             upsample_params={"upsample_scales": [4, 4, 8]},
             layers=2, stacks=1, residual_channels=8, gate_channels=8,
             skip_out_channels=8, gin_channels=4, n_speakers=3,
             use_speaker_embedding=True, compute_dtype="", lr_schedule="",
             batch_size=2, num_workers=0)


@pytest.fixture(scope="module")
def ms_dump(tmp_path_factory):
    root = tmp_path_factory.mktemp("ms")
    rs = np.random.RandomState(0)
    lines = []
    for i in range(6):
        n_frames = 14 + i
        wave = rs.randint(0, 256, (n_frames * 128,)).astype(np.int16)
        mel = rs.randn(n_frames, 16).astype(np.float32)
        np.save(root / f"u{i}-wave.npy", wave)
        np.save(root / f"u{i}-feats.npy", mel)
        lines.append(f"u{i}-wave.npy|u{i}-feats.npy|{n_frames}|text|{i % 3}")
    (root / "train.txt").write_text("\n".join(lines) + "\n")
    return str(root)


def test_manifest_speaker_parsing(ms_dump):
    ds = WaveNetDataset(ms_dump, CFG)
    assert ds.multi_speaker
    _, _, sid = ds[0]
    assert sid in (0, 1, 2)


def test_speaker_filter(ms_dump):
    ds = WaveNetDataset(ms_dump, CFG, speaker_id=1)
    assert all(u.speaker_id == 1 for u in ds.utterances)
    assert len(ds) == 2


def test_collate_includes_speaker_ids(ms_dump):
    ds = WaveNetDataset(ms_dump, CFG)
    batch = collate_fn([ds[0], ds[1]], CFG, rng=np.random.RandomState(0))
    assert "g" in batch
    assert batch["g"].shape == (2,)
    assert batch["g"].dtype == np.int32


def test_multispeaker_train_step(ms_dump):
    ds = WaveNetDataset(ms_dump, CFG)
    batch = collate_fn([ds[0], ds[1]], CFG, rng=np.random.RandomState(0))
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    sanity_check(spec_from_config(CFG), batch)
    state = create_train_state(CFG)
    step, _ = make_train_step(CFG)
    state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    # embedding gradient flowed
    emb0 = np.asarray(create_train_state(CFG).params["embed_speakers"]["table"])
    emb1 = np.asarray(state.params["embed_speakers"]["table"])
    assert not np.allclose(emb0, emb1)


def test_sanity_check_catches_mismatches(ms_dump):
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    ds = WaveNetDataset(ms_dump, CFG)
    batch = collate_fn([ds[0]], CFG, rng=np.random.RandomState(0))
    # model without global conditioning but batch has speaker ids
    bad = spec_from_config(CFG.replace(gin_channels=-1))
    with pytest.raises(ValueError):
        sanity_check(bad, batch)
    # model wants local conditioning, batch lacks it
    good = spec_from_config(CFG)
    with pytest.raises(ValueError):
        sanity_check(good, {"x": batch["x"], "g": batch["g"]})


def test_evaluate_cli_per_speaker(ms_dump, tmp_path):
    from wavenet_vocoder_tpu.cli.evaluate import main as ev
    from wavenet_vocoder_tpu.training import checkpoint as ckpt
    state = create_train_state(CFG)
    exp = str(tmp_path / "exp")
    path = ckpt.save_checkpoint(exp, state, global_step=0)
    with open(os.path.join(exp, "hparams.json"), "w") as f:
        f.write(CFG.to_json())
    out = str(tmp_path / "gen")
    ev([ms_dump, path, out, "--num-utterances", "1", "--batch-size", "2"])
    files = sorted(os.listdir(out))
    gens = [f for f in files if f.endswith("_gen.wav")]
    # one per speaker (3 speakers), speaker-prefixed names
    assert len(gens) == 3, files
    assert all(f.startswith("speaker") for f in gens)
