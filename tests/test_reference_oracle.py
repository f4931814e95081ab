"""Oracle parity tests against the reference implementation itself.

These tests import the PUBLIC reference (r9y9/wavenet_vocoder, mounted
read-only at /root/reference) as a numerical ORACLE: our weights are loaded
into the reference torch modules and outputs are compared elementwise. No
reference code is copied — the reference runs as an external black box, and
the tests skip cleanly when it (or torch) is unavailable.

Covered parity surfaces:
  * WaveNet batch forward — scalar/one-hot input, local conditioning,
    global speaker-embedding conditioning (reference: wavenet.py:164-213).
  * ConvInUpsampleNetwork / UpsampleNetwork upsampling incl. cin_pad indent
    (reference: upsample.py:12-86).
  * Discretized mix-logistic & mix-Gaussian losses (reference:
    mixture.py:26-106, 161-218).
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
sys.path.insert(0, REFERENCE)

from wavenet_vocoder import WaveNet as RefWaveNet  # noqa: E402
from wavenet_vocoder import mixture as ref_mixture  # noqa: E402
from wavenet_vocoder import upsample as ref_upsample  # noqa: E402

from wavenet_vocoder_tpu.models.upsample import (  # noqa: E402
    apply_conv_in_upsample_network,
    apply_upsample_network,
    init_conv_in_upsample_network,
    init_upsample_network,
)
from wavenet_vocoder_tpu.models.wavenet import (  # noqa: E402
    WaveNetSpec,
    apply_wavenet,
    init_wavenet,
)
from wavenet_vocoder_tpu.ops import mixture as our_mixture  # noqa: E402

torch.manual_seed(0)


# ----------------------------------------------------------------------
# weight transplant: our param pytree -> reference torch modules
# ----------------------------------------------------------------------
def _load_conv1d(tconv, p):
    """Ours (K, In, Out) weight-normed {v, g, b} -> torch Conv1d (Out, In, K)
    with weight_norm (weight_v / weight_g)."""
    v = np.asarray(p["v"]).transpose(2, 1, 0)  # (Out, In, K)
    with torch.no_grad():
        if hasattr(tconv, "weight_v"):
            tconv.weight_v.copy_(torch.from_numpy(np.ascontiguousarray(v)))
            tconv.weight_g.copy_(
                torch.from_numpy(np.asarray(p["g"]).reshape(-1, 1, 1)))
        else:
            tconv.weight.copy_(torch.from_numpy(np.ascontiguousarray(v)))
        if "b" in p and tconv.bias is not None:
            tconv.bias.copy_(torch.from_numpy(np.asarray(p["b"])))


def _load_conv2d(tconv, p):
    """Ours (kh=time, kw=freq, 1, 1) -> torch Conv2d (1, 1, freq, time)."""
    v = np.asarray(p["v"]).transpose(3, 2, 1, 0)  # (out,in,freq,time)
    with torch.no_grad():
        tconv.weight_v.copy_(torch.from_numpy(np.ascontiguousarray(v)))
        tconv.weight_g.copy_(
            torch.from_numpy(np.asarray(p["g"]).reshape(1, 1, 1, 1)))


def _load_upsample_network(tnet, p):
    """Reference UpsampleNetwork: up_layers = [Stretch2d, weight-normed
    Conv2d, (activation)] per scale (reference: upsample.py:37-49)."""
    convs = [m for m in tnet.up_layers
             if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == len(p["convs"])
    for tconv, cp in zip(convs, p["convs"]):
        _load_conv2d(tconv, cp)


def _load_wavenet(ref: RefWaveNet, params, spec: WaveNetSpec):
    _load_conv1d(ref.first_conv, params["first_conv"])
    for tblock, bp in zip(ref.conv_layers, params["blocks"]):
        _load_conv1d(tblock.conv, bp["conv"])
        _load_conv1d(tblock.conv1x1_out, bp["out"])
        _load_conv1d(tblock.conv1x1_skip, bp["skip"])
        if "cond_c" in bp:
            _load_conv1d(tblock.conv1x1c, bp["cond_c"])
        if "cond_g" in bp:
            _load_conv1d(tblock.conv1x1g, bp["cond_g"])
    _load_conv1d(ref.last_conv_layers[1], params["last_conv1"])
    _load_conv1d(ref.last_conv_layers[3], params["last_conv2"])
    if spec.has_speaker_embedding:
        with torch.no_grad():
            ref.embed_speakers.weight.copy_(
                torch.from_numpy(np.asarray(
                    params["embed_speakers"]["table"])))
    if spec.upsample_conditional_features:
        up = params["upsample_net"]
        if spec.upsample_net == "ConvInUpsampleNetwork":
            _load_conv1d(ref.upsample_net.conv_in, up["conv_in"])
            _load_upsample_network(ref.upsample_net.upsample, up["upsample"])
        else:
            _load_upsample_network(ref.upsample_net, up)


def _build_pair(**kw):
    """Matching (ref torch model, our (params, spec)) with transplanted
    weights."""
    spec = WaveNetSpec(
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
        upsample_net=kw.get("upsample_net", "ConvInUpsampleNetwork"),
        upsample_scales=kw.get("upsample_scales", (4, 4, 4, 4)),
        cin_pad=kw.get("cin_pad", 0),
        scalar_input=kw.get("scalar_input", True),
        use_speaker_embedding=kw.get("use_speaker_embedding", False),
    )
    params = init_wavenet(jax.random.PRNGKey(42), spec)

    upsample_params = {"upsample_scales": list(spec.upsample_scales)}
    if kw.get("upsample", False):
        upsample_params["cin_pad"] = spec.cin_pad
        upsample_params["cin_channels"] = spec.cin_channels
    ref = RefWaveNet(
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
    _load_wavenet(ref, params, spec)
    return ref, params, spec


def _forward_ref(ref, x_btc, c_btc=None, g=None):
    """Run reference forward; channels-last in/out for comparison."""
    x = torch.from_numpy(np.ascontiguousarray(x_btc.transpose(0, 2, 1)))
    c = (None if c_btc is None else
         torch.from_numpy(np.ascontiguousarray(c_btc.transpose(0, 2, 1))))
    gt = None if g is None else torch.from_numpy(np.asarray(g))
    with torch.no_grad():
        y = ref(x, c=c, g=gt, softmax=False)
    return y.numpy().transpose(0, 2, 1)  # (B, T, C)


# ----------------------------------------------------------------------
# model-forward parity
# ----------------------------------------------------------------------
def test_forward_scalar_local_cond():
    ref, params, spec = _build_pair(cin_channels=20)
    rs = np.random.RandomState(0)
    x = rs.uniform(-0.9, 0.9, (2, 1, 64)).astype(np.float32).transpose(0, 2, 1)
    c = rs.randn(2, 64, 20).astype(np.float32)
    ours = np.asarray(apply_wavenet(params, spec, jnp.asarray(x),
                                    c=jnp.asarray(c)))
    theirs = _forward_ref(ref, x, c)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_forward_onehot_unconditional():
    ref, params, spec = _build_pair(out_channels=64, scalar_input=False)
    rs = np.random.RandomState(1)
    ids = rs.randint(0, 64, (2, 48))
    x = np.eye(64, dtype=np.float32)[ids]  # (B, T, 64)
    ours = np.asarray(apply_wavenet(params, spec, jnp.asarray(x)))
    theirs = _forward_ref(ref, x)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_forward_global_speaker_embedding():
    ref, params, spec = _build_pair(
        cin_channels=20, gin_channels=12, n_speakers=3,
        use_speaker_embedding=True)
    rs = np.random.RandomState(2)
    x = rs.uniform(-0.9, 0.9, (3, 40, 1)).astype(np.float32)
    c = rs.randn(3, 40, 20).astype(np.float32)
    g = np.array([0, 2, 1], dtype=np.int64)
    ours = np.asarray(apply_wavenet(params, spec, jnp.asarray(x),
                                    c=jnp.asarray(c), g=jnp.asarray(g)))
    theirs = _forward_ref(ref, x, c, g)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_forward_with_upsample_and_cin_pad():
    scales = (2, 2)
    cin_pad = 2
    ref, params, spec = _build_pair(
        cin_channels=10, upsample=True, upsample_scales=scales,
        cin_pad=cin_pad)
    rs = np.random.RandomState(3)
    frames = 20
    T = (frames - 2 * cin_pad) * int(np.prod(scales))
    x = rs.uniform(-0.9, 0.9, (2, T, 1)).astype(np.float32)
    c = rs.randn(2, frames, 10).astype(np.float32)
    ours = np.asarray(apply_wavenet(params, spec, jnp.asarray(x),
                                    c=jnp.asarray(c)))
    theirs = _forward_ref(ref, x, c)
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


# ----------------------------------------------------------------------
# upsample-network parity (standalone, both variants)
# ----------------------------------------------------------------------
def test_upsample_network_parity():
    scales = (3, 4)
    cin_pad = 1
    p = init_upsample_network(
        jax.random.PRNGKey(0), upsample_scales=scales,
        freq_axis_kernel_size=3, cin_channels=8)
    tnet = ref_upsample.UpsampleNetwork(
        upsample_scales=list(scales), freq_axis_kernel_size=3,
        cin_pad=cin_pad, cin_channels=8).eval()
    _load_upsample_network(tnet, p)

    rs = np.random.RandomState(4)
    c = rs.randn(2, 12, 8).astype(np.float32)  # (B, T_mel, C)
    ours = np.asarray(apply_upsample_network(
        p, jnp.asarray(c), upsample_scales=scales, cin_pad=cin_pad))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(
            np.ascontiguousarray(c.transpose(0, 2, 1))))
    theirs = theirs.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


def test_conv_in_upsample_network_parity():
    scales = (2, 2)
    cin_pad = 2
    p = init_conv_in_upsample_network(
        jax.random.PRNGKey(1), upsample_scales=scales, cin_pad=cin_pad,
        cin_channels=6)
    tnet = ref_upsample.ConvInUpsampleNetwork(
        upsample_scales=list(scales), cin_pad=cin_pad,
        cin_channels=6).eval()
    _load_conv1d(tnet.conv_in, p["conv_in"])
    _load_upsample_network(tnet.upsample, p["upsample"])

    rs = np.random.RandomState(5)
    c = rs.randn(2, 16, 6).astype(np.float32)
    ours = np.asarray(apply_conv_in_upsample_network(
        p, jnp.asarray(c), upsample_scales=scales))
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(
            np.ascontiguousarray(c.transpose(0, 2, 1))))
    theirs = theirs.numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(ours, theirs, atol=1e-5, rtol=1e-5)


# ----------------------------------------------------------------------
# mixture-loss parity
# ----------------------------------------------------------------------
def test_discretized_mix_logistic_loss_parity():
    rs = np.random.RandomState(6)
    B, T, C = 2, 50, 30
    y_hat = rs.randn(B, T, C).astype(np.float32)
    y = rs.uniform(-0.99, 0.99, (B, T, 1)).astype(np.float32)
    ours = np.asarray(our_mixture.discretized_mix_logistic_loss(
        jnp.asarray(y_hat), jnp.asarray(y), num_classes=65536,
        log_scale_min=-16.0, reduce=False))
    with torch.no_grad():
        theirs = ref_mixture.discretized_mix_logistic_loss(
            torch.from_numpy(y_hat.transpose(0, 2, 1)),
            torch.from_numpy(y), num_classes=65536,
            log_scale_min=-16.0, reduce=False).numpy()
    # rtol 1e-3: the 65536-bin CDF difference amplifies f32 rounding between
    # XLA and torch op orderings; semantic (per-element NLL) agreement only
    np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-3)


def test_mix_gaussian_loss_parity():
    rs = np.random.RandomState(7)
    B, T, C = 2, 50, 30
    y_hat = rs.randn(B, T, C).astype(np.float32)
    y = rs.uniform(-0.99, 0.99, (B, T, 1)).astype(np.float32)
    ours = np.asarray(our_mixture.mix_gaussian_loss(
        jnp.asarray(y_hat), jnp.asarray(y), log_scale_min=-16.0,
        reduce=False))
    with torch.no_grad():
        theirs = ref_mixture.mix_gaussian_loss(
            torch.from_numpy(y_hat.transpose(0, 2, 1)),
            torch.from_numpy(y), log_scale_min=-16.0,
            reduce=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)


def test_single_gaussian_loss_parity():
    rs = np.random.RandomState(8)
    B, T = 2, 40
    y_hat = rs.randn(B, T, 2).astype(np.float32)
    y = rs.uniform(-0.99, 0.99, (B, T, 1)).astype(np.float32)
    ours = np.asarray(our_mixture.mix_gaussian_loss(
        jnp.asarray(y_hat), jnp.asarray(y), log_scale_min=-16.0,
        reduce=False))
    with torch.no_grad():
        theirs = ref_mixture.mix_gaussian_loss(
            torch.from_numpy(y_hat.transpose(0, 2, 1)),
            torch.from_numpy(y), log_scale_min=-16.0,
            reduce=False).numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-4, rtol=1e-4)
