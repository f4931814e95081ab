"""Torch-checkpoint import: reference .pth -> our param pytree.

The inverse direction of tests/test_reference_oracle.py: there OUR weights
are transplanted into the reference torch model; here a randomly initialized
REFERENCE model is saved as a real reference-format checkpoint
(reference: train.py:852-884) and imported, and the two forwards must agree
elementwise. Covers weight-normed and folded (make_generation_fast_) forms,
conditioning variants, the EMA twin, and the conversion CLI.
"""
import os
import sys

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REFERENCE = os.environ.get("WAVENET_REFERENCE", "/root/reference")

torch = pytest.importorskip("torch")
if not os.path.isdir(os.path.join(REFERENCE, "wavenet_vocoder")):
    pytest.skip("reference checkout not available", allow_module_level=True)
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from wavenet_vocoder import WaveNet as RefWaveNet  # noqa: E402

from wavenet_vocoder_tpu.compat.torch_import import (  # noqa: E402
    ema_twin_path,
    load_torch_checkpoint,
    params_from_state_dict,
)
from wavenet_vocoder_tpu.models.wavenet import (  # noqa: E402
    WaveNetSpec,
    apply_wavenet,
)

torch.manual_seed(1234)


def _make_spec(**kw):
    return WaveNetSpec(
        out_channels=kw.get("out_channels", 30),
        layers=kw.get("layers", 4),
        stacks=kw.get("stacks", 2),
        residual_channels=16,
        gate_channels=32,
        skip_out_channels=16,
        kernel_size=3,
        dropout=0.0,
        cin_channels=kw.get("cin_channels", -1),
        gin_channels=kw.get("gin_channels", -1),
        n_speakers=kw.get("n_speakers"),
        upsample_conditional_features=kw.get("upsample", False),
        upsample_scales=kw.get("upsample_scales", (4, 4, 4, 4)),
        cin_pad=kw.get("cin_pad", 0),
        scalar_input=kw.get("scalar_input", True),
        use_speaker_embedding=kw.get("use_speaker_embedding", False),
    )


def _make_ref(spec: WaveNetSpec) -> RefWaveNet:
    upsample_params = {"upsample_scales": list(spec.upsample_scales)}
    if spec.upsample_conditional_features:
        upsample_params["cin_pad"] = spec.cin_pad
        upsample_params["cin_channels"] = spec.cin_channels
    return RefWaveNet(
        out_channels=spec.out_channels, layers=spec.layers,
        stacks=spec.stacks, residual_channels=spec.residual_channels,
        gate_channels=spec.gate_channels,
        skip_out_channels=spec.skip_out_channels,
        kernel_size=spec.kernel_size, dropout=0.0,
        cin_channels=spec.cin_channels, gin_channels=spec.gin_channels,
        n_speakers=spec.n_speakers,
        upsample_conditional_features=spec.upsample_conditional_features,
        upsample_net=spec.upsample_net,
        upsample_params=upsample_params,
        scalar_input=spec.scalar_input,
        use_speaker_embedding=spec.use_speaker_embedding,
        cin_pad=spec.cin_pad,
    ).eval()


def _forward_ref(ref, x_btc, c_btc=None, g=None):
    x = torch.from_numpy(np.ascontiguousarray(x_btc.transpose(0, 2, 1)))
    c = (None if c_btc is None else
         torch.from_numpy(np.ascontiguousarray(c_btc.transpose(0, 2, 1))))
    gt = None if g is None else torch.from_numpy(np.asarray(g))
    with torch.no_grad():
        y = ref(x, c=c, g=gt, softmax=False)
    return y.numpy().transpose(0, 2, 1)


def _compare(ref, spec, *, T=48, cin=None, g=None, seed=0, atol=1e-4):
    params = params_from_state_dict(
        {k: v for k, v in ref.state_dict().items()}, spec)
    rs = np.random.RandomState(seed)
    if spec.scalar_input:
        x = rs.uniform(-0.9, 0.9, (2, T, 1)).astype(np.float32)
    else:
        ids = rs.randint(0, spec.out_channels, (2, T))
        x = np.eye(spec.out_channels, dtype=np.float32)[ids]
    c = None
    if cin is not None:
        c = rs.randn(2, cin[0], spec.cin_channels).astype(np.float32)
    ours = np.asarray(apply_wavenet(
        params, spec, jnp.asarray(x),
        c=None if c is None else jnp.asarray(c),
        g=None if g is None else jnp.asarray(g)))
    theirs = _forward_ref(ref, x, c, g)
    np.testing.assert_allclose(ours, theirs, atol=atol, rtol=1e-4)


def test_import_scalar_local_cond():
    spec = _make_spec(cin_channels=20)
    ref = _make_ref(spec)
    _compare(ref, spec, cin=(48,))


def test_import_onehot_unconditional():
    spec = _make_spec(out_channels=64, scalar_input=False)
    ref = _make_ref(spec)
    _compare(ref, spec)


def test_import_speaker_embedding_and_upsample():
    scales = (2, 2)
    cin_pad = 2
    spec = _make_spec(cin_channels=10, gin_channels=12, n_speakers=3,
                      use_speaker_embedding=True, upsample=True,
                      upsample_scales=scales, cin_pad=cin_pad)
    ref = _make_ref(spec)
    frames = 20
    T = (frames - 2 * cin_pad) * int(np.prod(scales))
    _compare(ref, spec, T=T, cin=(frames,), g=np.array([0, 2], np.int64))


def test_import_folded_weight_norm():
    """After make_generation_fast_ the state dict has plain .weight keys —
    the importer must produce {w} params with identical math
    (reference: wavenet.py:355-361)."""
    spec = _make_spec(cin_channels=20)
    ref = _make_ref(spec)
    before = params_from_state_dict(dict(ref.state_dict()), spec)
    ref.make_generation_fast_()
    _compare(ref, spec, cin=(48,))
    after = params_from_state_dict(dict(ref.state_dict()), spec)
    assert "w" in after["first_conv"] and "v" in before["first_conv"]


def test_import_rejects_wrong_spec():
    spec = _make_spec(cin_channels=20)
    ref = _make_ref(spec)
    wrong = _make_spec(cin_channels=20, layers=6, stacks=2)
    with pytest.raises((KeyError, ValueError)):
        params_from_state_dict(dict(ref.state_dict()), wrong)


def test_full_checkpoint_and_counters(tmp_path):
    spec = _make_spec(cin_channels=20)
    ref = _make_ref(spec)
    path = str(tmp_path / "checkpoint_step000001234.pth")
    torch.save({
        "state_dict": ref.state_dict(),
        "optimizer": None,
        "global_step": 1234,
        "global_epoch": 7,
        "global_test_step": 99,
    }, path)
    params, counters = load_torch_checkpoint(path, spec)
    assert counters == {"global_step": 1234, "global_epoch": 7,
                        "global_test_step": 99}
    assert "blocks" in params and len(params["blocks"]) == spec.layers
    # EMA twin detection
    assert ema_twin_path(path) is None
    twin = str(tmp_path / "checkpoint_step000001234_ema.pth")
    torch.save({"state_dict": ref.state_dict(), "global_step": 1234}, twin)
    assert ema_twin_path(path) == twin
    assert ema_twin_path(twin) is None


def test_import_cli_roundtrip(tmp_path):
    """CLI writes our checkpoint format; loading it back into a TrainState
    restores params + counters (the migration path end-to-end)."""
    import pickle

    from wavenet_vocoder_tpu.cli.import_checkpoint import main as cli_main
    from wavenet_vocoder_tpu.config import Config

    cfg = Config(
        input_type="raw", quantize_channels=65536, out_channels=30,
        layers=4, stacks=2, residual_channels=16, gate_channels=32,
        skip_out_channels=16, kernel_size=3, cin_channels=20,
        upsample_conditional_features=False, cin_pad=0, gin_channels=-1)
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config
    spec = spec_from_config(cfg)
    ref = _make_ref(spec)

    src = str(tmp_path / "checkpoint_step000000100.pth")
    torch.save({"state_dict": ref.state_dict(), "global_step": 100,
                "global_epoch": 2, "global_test_step": 5}, src)
    torch.save({"state_dict": ref.state_dict(), "global_step": 100},
               str(tmp_path / "checkpoint_step000000100_ema.pth"))
    preset = str(tmp_path / "preset.json")
    with open(preset, "w") as f:
        f.write(cfg.to_json())

    out_dir = str(tmp_path / "out")
    cli_main([src, out_dir, "--preset", preset])

    from wavenet_vocoder_tpu.training import checkpoint as ckpt_lib
    payload = ckpt_lib.load_params(
        os.path.join(out_dir, "checkpoint_step000000100.npz"))
    assert payload.counters["global_step"] == 100
    assert payload.counters["global_epoch"] == 2
    direct, _ = load_torch_checkpoint(src, spec)
    saved = dict(zip(payload.param_paths, payload.params_flat))
    np.testing.assert_allclose(saved["['first_conv']['v']"],
                               np.asarray(direct["first_conv"]["v"]))
    # EMA twin + latest copies + hparams.json all materialize
    for name in ("checkpoint_step000000100_ema.npz", "checkpoint_latest.npz",
                 "checkpoint_latest_ema.npz", "hparams.json"):
        assert os.path.exists(os.path.join(out_dir, name)), name


def test_ar_decoder_parity_with_reference_incremental_forward():
    """The strongest generation-parity oracle: the reference's own
    incremental_forward (teacher-forced, softmax probs; reference:
    wavenet.py:215-343) vs our scan decoder on IMPORTED weights — the whole
    migration story (import -> generate) validated elementwise."""
    from wavenet_vocoder_tpu.ops.generate import generate

    spec = _make_spec(out_channels=256, scalar_input=False, cin_channels=12)
    ref = _make_ref(spec)
    params = params_from_state_dict(dict(ref.state_dict()), spec)

    rs = np.random.RandomState(11)
    B, T = 2, 40
    ids = rs.randint(0, 256, (B, T))
    x = np.eye(256, dtype=np.float32)[ids]           # (B, T, 256)
    c = rs.randn(B, T, 12).astype(np.float32)

    ours = np.asarray(generate(
        params, spec, jax.random.PRNGKey(0),
        test_inputs=jnp.asarray(x), c=jnp.asarray(c),
        softmax=True, quantize=False, output="samples")["samples"])

    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)))
    ct = torch.from_numpy(np.ascontiguousarray(c.transpose(0, 2, 1)))
    with torch.no_grad():
        theirs = ref.incremental_forward(
            test_inputs=xt, c=ct, T=T, softmax=True, quantize=False,
            tqdm=lambda it: it)
    theirs = theirs.numpy().transpose(0, 2, 1)       # (B, T, 256)

    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_flagship_checkpoint_import_and_incremental_parity(tmp_path):
    """VERDICT r3 #8: a FULL-SIZE reference-architecture checkpoint (24L/4S,
    128/256/128, MoL over 80-mel with the default 4x upsample stack —
    reference hparams.py:58-73) written in the reference's own
    save_checkpoint format (reference: train.py:852-884), imported, and
    held to elementwise parity at flagship scale:

      * batch forward ours == torch forward (the full conditioning path:
        ConvInUpsampleNetwork + cin_pad trimming + 24-layer stack + head)
      * teacher-forced scan decoder LOGITS == our batch forward (the AR
        engine at flagship scale; the reference's scalar-input
        incremental_forward only returns SAMPLED values — torch-RNG draws
        that cannot be compared deterministically, so torch-incremental
        parity is asserted on the categorical flagship below instead)

    ~2-4 min on CPU (the reference's Python AR loop dominates); run with
      env PYTHONPATH= python -m pytest tests/test_torch_import.py -m slow
    """
    scales = (4, 4, 4, 4)
    cin_pad = 2
    spec = WaveNetSpec(
        out_channels=30, layers=24, stacks=4, residual_channels=128,
        gate_channels=256, skip_out_channels=128, kernel_size=3, dropout=0.0,
        cin_channels=80, gin_channels=-1,
        upsample_conditional_features=True, upsample_scales=scales,
        cin_pad=cin_pad, scalar_input=True, output_distribution="Logistic")
    ref = _make_ref(spec)

    # the reference's exact on-disk checkpoint layout (train.py:852-884)
    path = str(tmp_path / "checkpoint_step000400000.pth")
    torch.save({"state_dict": ref.state_dict(), "optimizer": None,
                "global_step": 400000, "global_epoch": 100,
                "global_test_step": 3}, path)
    params, counters = load_torch_checkpoint(path, spec)
    assert counters["global_step"] == 400000

    hop = int(np.prod(scales))
    frames = 2 * cin_pad + 2                      # T = 512 samples
    T = (frames - 2 * cin_pad) * hop
    rs = np.random.RandomState(42)
    x = rs.uniform(-0.9, 0.9, (1, T, 1)).astype(np.float32)
    c = rs.randn(1, frames, spec.cin_channels).astype(np.float32)

    # 1) batch forward parity
    ours = np.asarray(apply_wavenet(params, spec, jnp.asarray(x),
                                    c=jnp.asarray(c)))
    theirs = _forward_ref(ref, x, c)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)

    # 2) teacher-forced AR engine at flagship scale: per-step head params
    # from the scan decoder == the one-shot batch forward (the central
    # invariant, reference: tests/test_model.py:173-174, at full size)
    from wavenet_vocoder_tpu.ops.generate import generate
    ours_ar = np.asarray(generate(
        params, spec, jax.random.PRNGKey(0), test_inputs=jnp.asarray(x),
        c=jnp.asarray(c), output="logits")["logits"])
    np.testing.assert_allclose(ours_ar, ours, atol=2e-4, rtol=1e-4)


@pytest.mark.slow
def test_flagship_categorical_torch_incremental_parity():
    """Scan-vs-TORCH-incremental parity at flagship width/depth: the
    mu-law-256 head's teacher-forced softmax distribution is deterministic
    (no sampling in the compared quantity), so the reference's own Python
    AR loop (reference: wavenet.py:296-336) is an exact oracle for our
    lax.scan decoder at 24L/128/256/128 scale."""
    spec = WaveNetSpec(
        out_channels=256, layers=24, stacks=4, residual_channels=128,
        gate_channels=256, skip_out_channels=128, kernel_size=3, dropout=0.0,
        cin_channels=80, scalar_input=False)
    ref = _make_ref(spec)
    params = params_from_state_dict(dict(ref.state_dict()), spec)

    rs = np.random.RandomState(7)
    B, T = 1, 256
    ids = rs.randint(0, 256, (B, T))
    x = np.eye(256, dtype=np.float32)[ids]
    c = rs.randn(B, T, spec.cin_channels).astype(np.float32)

    from wavenet_vocoder_tpu.ops.generate import generate
    ours = np.asarray(generate(
        params, spec, jax.random.PRNGKey(0), test_inputs=jnp.asarray(x),
        c=jnp.asarray(c), softmax=True, quantize=False,
        output="samples")["samples"])

    xt = torch.from_numpy(np.ascontiguousarray(x.transpose(0, 2, 1)))
    ct = torch.from_numpy(np.ascontiguousarray(c.transpose(0, 2, 1)))
    with torch.no_grad():
        theirs = ref.incremental_forward(
            test_inputs=xt, c=ct, T=T, softmax=True, quantize=False,
            tqdm=lambda it: it)
    theirs = theirs.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_import_rejects_unconsumed_conditioning_weights():
    """A speaker-conditioned checkpoint imported with an unconditioned spec
    must fail loudly (the weights would otherwise be silently dropped and
    the model would generate unconditioned audio)."""
    spec = _make_spec(cin_channels=20, gin_channels=12, n_speakers=3,
                      use_speaker_embedding=True)
    ref = _make_ref(spec)
    no_g = _make_spec(cin_channels=20)
    with pytest.raises(ValueError, match="no slot"):
        params_from_state_dict(dict(ref.state_dict()), no_g)
    no_c = _make_spec(gin_channels=12, n_speakers=3,
                      use_speaker_embedding=True)
    with pytest.raises(ValueError, match="no slot"):
        params_from_state_dict(dict(ref.state_dict()), no_c)


def test_pallas_generator_rejects_partial_unroll():
    from wavenet_vocoder_tpu.ops.pallas_generate import PallasGenerator
    from wavenet_vocoder_tpu.models.wavenet import init_wavenet
    spec = _make_spec(cin_channels=4)
    params = init_wavenet(jax.random.PRNGKey(0), spec)
    with pytest.raises(ValueError, match="unroll"):
        PallasGenerator(params, spec, chunk=16, unroll=8)
