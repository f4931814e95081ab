"""Fused training-stack kernel == the XLA layer loop, forward AND gradients
(interpret mode on CPU; byte-level motivation in ops/pallas_train.py).

Oracle: apply the same folded-weight residual stack with XLA res_block and
compare outputs + grads w.r.t. every input."""
import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wavenet_vocoder_tpu.models.layers import res_block
from wavenet_vocoder_tpu.models.wavenet import (
    WaveNetSpec,
    init_wavenet,
    make_generation_fast,
)
from wavenet_vocoder_tpu.ops import pallas_train as pt


def _spec(**kw):
    base = dict(out_channels=64, layers=4, stacks=2, residual_channels=16,
                gate_channels=32, skip_out_channels=24, cin_channels=8,
                scalar_input=True, output_distribution="Logistic")
    base.update(kw)
    return WaveNetSpec(**base)


def _xla_stack(blocks, spec, x0, c, g=None):
    skips = None
    x = x0
    g_exp = None if g is None else g[:, None, :]
    for bp, d in zip(blocks, spec.dilations):
        x, h = res_block(bp, x, c, g_exp, dilation=d)
        skips = h if skips is None else skips + h
    return skips


def _setup(spec, B=2, T=96, seed=0):
    params = make_generation_fast(
        init_wavenet(jax.random.PRNGKey(seed), spec))
    blocks = params["blocks"]
    rs = np.random.RandomState(seed)
    x0 = jnp.asarray(rs.randn(B, T, spec.residual_channels)
                     .astype(np.float32))
    c = (jnp.asarray(rs.randn(B, T, spec.cin_channels).astype(np.float32))
         if spec.has_local_conditioning else None)
    return blocks, x0, c


@pytest.mark.parametrize("T,Tt", [(96, 32), (96, 96), (100, 32)])
def test_fused_forward_matches_xla(T, Tt):
    spec = _spec()
    blocks, x0, c = _setup(spec, T=T)
    ref = np.asarray(_xla_stack(blocks, spec, x0, c))
    got = np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=Tt,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_fused_forward_no_conditioning():
    spec = _spec(cin_channels=-1)
    blocks, x0, c = _setup(spec)
    ref = np.asarray(_xla_stack(blocks, spec, x0, None))
    got = np.asarray(pt.fused_res_stack(
        x0, None, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_fused_forward_global_cond():
    """Global conditioning: the time-constant cond_g projection enters the
    kernel as a per-(layer, batch) bias (reference: modules.py:149-154)."""
    spec = _spec(gin_channels=6, use_speaker_embedding=False)
    blocks, x0, c = _setup(spec)
    rs = np.random.RandomState(3)
    g = jnp.asarray(rs.randn(2, 6).astype(np.float32))
    ref = np.asarray(_xla_stack(blocks, spec, x0, c, g))
    got = np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, g=g, dtype=jnp.float32, Bt=2, Tt=32,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_fused_gradients_global_cond():
    """d loss / d {cond_g weights, g vector} match the XLA path (dgb is
    accumulated home-masked in the backward kernel, then chained to cond_g
    through the XLA-side (L, B, G) bias stack)."""
    spec = _spec(gin_channels=6, use_speaker_embedding=False)
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(11)
    g = jnp.asarray(rs.randn(2, 6).astype(np.float32))
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def loss_xla(blocks, x0, c, g):
        return jnp.sum(_xla_stack(blocks, spec, x0, c, g) * w)

    def loss_fused(blocks, x0, c, g):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec, g=g, dtype=jnp.float32, Bt=1, Tt=32,
            interpret=True) * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(blocks, x0, c, g)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(blocks, x0, c, g)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)


def test_fused_gradients_match_xla():
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(7)
    # random cotangent projection -> scalar loss; grads must agree for
    # x0, c, and every conv weight/bias in every block
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def loss_xla(blocks, x0, c):
        return jnp.sum(_xla_stack(blocks, spec, x0, c) * w)

    def loss_fused(blocks, x0, c):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
            interpret=True) * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(blocks, x0, c)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(blocks, x0, c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)


def test_fused_gradients_weight_norm_chain():
    """Grad flows through the weight-norm fold (done in XLA outside the
    kernel): d loss / d (g, v) matches the pure-XLA path."""
    spec = _spec(layers=2, stacks=1)
    params = init_wavenet(jax.random.PRNGKey(0), spec)  # weight-normed
    rs = np.random.RandomState(1)
    B, T = 2, 64
    x0 = jnp.asarray(rs.randn(B, T, spec.residual_channels)
                     .astype(np.float32))
    c = jnp.asarray(rs.randn(B, T, spec.cin_channels).astype(np.float32))
    w = jnp.asarray(rs.randn(B, T, spec.skip_out_channels)
                    .astype(np.float32))

    from wavenet_vocoder_tpu.models.layers import remove_weight_norm

    def fold_blocks(blocks):
        return jax.tree.map(
            lambda bp: bp, [
                {k: (remove_weight_norm(v) if "v" in v else v)
                 for k, v in bp.items()} for bp in blocks],
            is_leaf=lambda n: isinstance(n, dict) and "v" in n)

    def loss_xla(blocks):
        folded = fold_blocks(blocks)
        return jnp.sum(_xla_stack(folded, spec, x0, c) * w)

    def loss_fused(blocks):
        folded = fold_blocks(blocks)
        return jnp.sum(pt.fused_res_stack(
            x0, c, folded, spec, dtype=jnp.float32, Bt=2, Tt=32,
            interpret=True) * w)

    g_ref = jax.grad(loss_xla)(params["blocks"])
    g_got = jax.grad(loss_fused)(params["blocks"])
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)


def test_fused_nonzero_biases_first_tile():
    """Regression: with nonzero conv/out biases (i.e. any trained model) the
    first time tile's synthetic zero halo must not fabricate x_l history —
    true causal semantics pin x_l[t<0] = 0 (each layer's conv zero-pads).
    Fresh-init tests missed this because biases start at zero."""
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(5)
    blocks = [
        {**bp,
         "conv": {**bp["conv"], "b": jnp.asarray(
             rs.randn(spec.gate_channels).astype(np.float32))},
         "out": {**bp["out"], "b": jnp.asarray(
             rs.randn(spec.residual_channels).astype(np.float32))},
         "skip": {**bp["skip"], "b": jnp.asarray(
             rs.randn(spec.skip_out_channels).astype(np.float32))}}
        for bp in blocks]
    ref = np.asarray(_xla_stack(blocks, spec, x0, c))
    got = np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
        interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)

    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))
    g_ref = jax.grad(lambda b_: jnp.sum(_xla_stack(b_, spec, x0, c) * w))(
        blocks)
    g_got = jax.grad(lambda b_: jnp.sum(pt.fused_res_stack(
        x0, c, b_, spec, dtype=jnp.float32, Bt=2, Tt=32,
        interpret=True) * w))(blocks)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)


def test_fused_train_step_matches_xla():
    """End-to-end: a full train step (loss, grads, optimizer update) with
    fused_train=True matches the XLA path bit-for-bit-ish (f32, dropout=0)."""
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)

    kw = dict(input_type="raw", quantize_channels=65536, out_channels=30,
              layers=4, stacks=2, residual_channels=16, gate_channels=32,
              skip_out_channels=24, cin_channels=8,
              upsample_conditional_features=False, dropout=0.0,
              compute_dtype="", lr_schedule="",
              optimizer_params={"lr": 1e-3, "eps": 1e-8,
                                "weight_decay": 0.0})
    cfg_x = Config(**kw)
    cfg_f = Config(**{**kw, "fused_train": True})

    rs = np.random.RandomState(0)
    B, T = 2, 96
    batch = {
        "x": jnp.asarray(rs.uniform(-0.5, 0.5, (B, T, 1))
                         .astype(np.float32)),
        "y": jnp.asarray(rs.uniform(-0.5, 0.5, (B, T, 1))
                         .astype(np.float32)),
        "c": jnp.asarray(rs.randn(B, T, 8).astype(np.float32)),
        "input_lengths": jnp.asarray([T, T - 7], jnp.int32),
    }
    batch["y"] = batch["x"].copy()

    s_x = create_train_state(cfg_x)
    s_f = create_train_state(cfg_f)
    # identical init (same seed)
    for a, b in zip(jax.tree.leaves(s_x.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    step_x, _ = make_train_step(cfg_x)
    step_f, _ = make_train_step(cfg_f)
    rng = jax.random.PRNGKey(0)
    for i in range(2):
        s_x, m_x = step_x(s_x, batch, rng)
        s_f, m_f = step_f(s_f, batch, rng)
    np.testing.assert_allclose(float(m_x["loss"]), float(m_f["loss"]),
                               rtol=1e-5)
    # Adam divides by sqrt(nu)+eps, amplifying f32 accumulation-order noise
    # between the two (mathematically identical) grad computations
    for a, b in zip(jax.tree.leaves(s_x.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=4e-4)


def test_fused_train_step_sharded_matches_single():
    """Multi-device fused training: the stack dispatches through shard_map
    over the mesh data axis (GSPMD cannot partition Mosaic custom calls).
    The sharded step must reproduce the single-device step — same loss,
    same updated params (weight cotangents psum'd by the shard_map
    transpose)."""
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.parallel import (
        make_mesh, shard_batch, shard_state)
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)

    if jax.device_count() < 4:
        pytest.skip("needs >=4 devices")
    mesh = make_mesh({"data": 4}, devices=jax.devices()[:4])

    cfg = Config(input_type="raw", quantize_channels=65536, out_channels=30,
                 layers=4, stacks=2, residual_channels=16, gate_channels=32,
                 skip_out_channels=24, cin_channels=8,
                 upsample_conditional_features=False, dropout=0.0,
                 compute_dtype="", lr_schedule="", fused_train=True)
    rs = np.random.RandomState(0)
    B, T = 8, 96
    x = rs.uniform(-0.5, 0.5, (B, T, 1)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(x.copy()),
             "c": jnp.asarray(rs.randn(B, T, 8).astype(np.float32)),
             "input_lengths": jnp.asarray([T] * B, jnp.int32)}

    s1 = create_train_state(cfg)
    step1, _ = make_train_step(cfg)
    s1, m1 = step1(s1, batch, jax.random.PRNGKey(0))

    sN = shard_state(create_train_state(cfg), mesh)
    stepN, _ = make_train_step(cfg, mesh=mesh)
    sN, mN = stepN(sN, shard_batch(batch, mesh, axis="data"),
                   jax.random.PRNGKey(0))

    np.testing.assert_allclose(float(mN["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(sN.params)):
        np.testing.assert_allclose(np.asarray(jax.device_get(b)),
                                   np.asarray(a), atol=2e-5)


# ----------------------------------------------------------------------
# dropout (reference applies dropout to each block's conv input,
# modules.py:126-128; the fused kernels use a counter-based mask keyed on
# absolute (batch, time, layer, channel) indices)
# ----------------------------------------------------------------------
def _xla_stack_masked(blocks, spec, x0, c, seed, drop):
    """XLA oracle applying the kernel's OWN counter-based masks: conv input
    dropped, residual passthrough un-dropped (reference: modules.py:126-128).
    Absolute position t keys to t + H — must mirror fused_res_stack's key
    derivation exactly."""
    from wavenet_vocoder_tpu.models.layers import _gated, causal_conv, conv1x1
    keep = 1.0 - drop
    B, T, R = x0.shape
    L = spec.layers
    H = pt.stack_receptive(spec.dilations, spec.kernel_size)
    x = x0
    skips = None
    for l, (bp, d) in enumerate(zip(blocks, spec.dilations)):
        m = pt.dropout_mask(jnp.asarray(seed, jnp.int32), Bt=B, E=T, R=R,
                            L=L, l=l, b0=0, t0=H, keep=keep)
        residual = x
        xd = (x * (m * (1.0 / keep))).astype(x.dtype)
        z = causal_conv(bp["conv"], xd, d)
        h = _gated(z, bp, c, None)
        s = conv1x1(bp["skip"], h)
        x = (conv1x1(bp["out"], h) + residual) * math.sqrt(0.5)
        skips = s if skips is None else skips + s
    return skips


SEED = jnp.full((1, 1), 1234, jnp.int32)


@pytest.mark.parametrize("T,Tt", [(96, 32), (96, 96), (100, 32)])
def test_fused_dropout_forward_matches_masked_xla(T, Tt):
    spec = _spec()
    blocks, x0, c = _setup(spec, T=T)
    ref = np.asarray(_xla_stack_masked(blocks, spec, x0, c, SEED, 0.3))
    got = np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=Tt,
        dropout=0.3, seed=SEED, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_fused_dropout_tile_shape_invariant():
    """The mask is keyed on ABSOLUTE indices, so different (Bt, Tt) tilings
    (different halos, different padding) must produce identical output."""
    spec = _spec()
    blocks, x0, c = _setup(spec, T=100)
    outs = [np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, dtype=jnp.float32, Bt=bt, Tt=tt,
        dropout=0.4, seed=SEED, interpret=True))
        for bt, tt in ((2, 32), (1, 64), (2, 128))]
    np.testing.assert_allclose(outs[1], outs[0], atol=2e-5, rtol=1e-5)
    np.testing.assert_allclose(outs[2], outs[0], atol=2e-5, rtol=1e-5)


def test_fused_dropout_gradients_match_masked_xla():
    """fwd+bwd with dropout: grads wrt every weight, x0 and c must match the
    masked-XLA oracle — the backward kernel regenerates the forward's exact
    masks on its own (differently-haloed) tiles."""
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(7)
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def loss_xla(blocks, x0, c):
        return jnp.sum(_xla_stack_masked(blocks, spec, x0, c, SEED, 0.3) * w)

    def loss_fused(blocks, x0, c):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
            dropout=0.3, seed=SEED, interpret=True) * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(blocks, x0, c)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(blocks, x0, c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)


def test_fused_dropout_grad_tiles_differ_from_forward():
    """Same grads when the backward tiles DIFFER from the forward's (the
    mask keying must be tile-shape independent across the fwd/bwd pair)."""
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(8)
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def loss(tt):
        def f(x0_):
            return jnp.sum(pt.fused_res_stack(
                x0_, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=tt,
                dropout=0.3, seed=SEED, interpret=True) * w)
        return f

    g32 = jax.grad(loss(32))(x0)
    g96 = jax.grad(loss(96))(x0)
    np.testing.assert_allclose(np.asarray(g96), np.asarray(g32),
                               atol=3e-4, rtol=2e-4)


def test_fused_gradients_no_act_stash(monkeypatch):
    """act_stash=False (the big-config VMEM fallback: phase 2 recomputes
    in_proj) must produce the same grads as the stash path."""
    monkeypatch.setenv("FUSED_ACT_STASH", "0")
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(7)
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def loss_fused(blocks, x0, c):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
            dropout=0.3, seed=SEED, interpret=True) * w)

    def loss_xla(blocks, x0, c):
        return jnp.sum(_xla_stack_masked(blocks, spec, x0, c, SEED, 0.3) * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(blocks, x0, c)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(blocks, x0, c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)


def test_vmem_gate_constants_ordered():
    """The tile/stash gates must sit below the compile-time scoped-VMEM
    limit (a gate-admitted config must never die in the Mosaic compiler),
    and the proven/fits boundaries stack above it in order."""
    assert pt.VMEM_TILE_GATE_BYTES < pt.VMEM_COMPILE_LIMIT_BYTES
    assert (pt.VMEM_COMPILE_LIMIT_BYTES < pt.BWD_EST_PROVEN_BYTES
            < pt.FUSED_FITS_GATE_BYTES)


def test_middle_zone_config_shrinks_time_tile():
    """A config whose Bt=1 estimate at the default tile lands between the
    compile limit and the fits gate (the r4 'untested middle zone') must
    get a SHRUNK time tile whose estimate is back under the proven
    boundary — while the flagship (est 124.6MB at its measured-optimal
    Tt=2048, just under the boundary) keeps its tiles."""
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.models.wavenet import spec_from_config

    flag = spec_from_config(Config())
    H = pt.stack_receptive(flag.dilations, flag.kernel_size)

    def est(spec, tt):
        return pt.bwd_vmem_estimate(
            L=spec.layers, k=spec.kernel_size, R=spec.residual_channels,
            G=spec.gate_channels, S=spec.skip_out_channels,
            cin=spec.cin_channels, Bt=1, E=tt + H, act_stash=False)

    def tiles(spec):
        return pt.pick_tiles(32, 10240, H, spec.layers,
                             spec.residual_channels, G=spec.gate_channels,
                             k=spec.kernel_size, S=spec.skip_out_channels,
                             cin=spec.cin_channels)

    # flagship: untouched, just under the proven boundary
    bt, tt = tiles(flag)
    assert (bt, tt) == (1, 2048), (bt, tt)
    assert est(flag, 2048) <= pt.BWD_EST_PROVEN_BYTES

    # middle zone (VERDICT r4 #3's construction: widen skip until the
    # estimate lands between the compile limit and the fits gate)
    mid = spec_from_config(Config(skip_out_channels=192))
    e_default = est(mid, 2048)
    assert pt.VMEM_COMPILE_LIMIT_BYTES < e_default < pt.FUSED_FITS_GATE_BYTES
    bt, tt = tiles(mid)
    assert bt == 1 and tt < 2048, (bt, tt)
    assert est(mid, tt) <= pt.BWD_EST_PROVEN_BYTES
    assert pt.fused_train_fits(mid, 10240)
    # the FINAL resolution (all cross-constraints) must also keep the
    # shrunk tile: the fwd tile's default must not round Tt_b back up past
    # the proven boundary (r5 review finding — the Tt_f cap was gated on
    # xs_hbm, silently re-opening the middle zone on the default path)
    for xs in (False, True):
        _, tt_f, bt_b, tt_b = pt.resolve_tiles(
            32, 10240, H, mid.layers, mid.residual_channels,
            G=mid.gate_channels, k=mid.kernel_size,
            S=mid.skip_out_channels, cin=mid.cin_channels,
            dils=mid.dilations, xs_hbm=xs)
        assert est(mid, tt_b) <= pt.BWD_EST_PROVEN_BYTES or xs, (xs, tt_b)
        assert tt_b % tt_f == 0
    # flagship keeps its measured-optimal tiles through the full resolution
    _, tt_f, bt_b, tt_b = pt.resolve_tiles(
        32, 10240, H, flag.layers, flag.residual_channels,
        G=flag.gate_channels, k=flag.kernel_size,
        S=flag.skip_out_channels, cin=flag.cin_channels,
        dils=flag.dilations, xs_hbm=False)
    assert (bt_b, tt_b, tt_f) == (1, 2048, 2048), (bt_b, tt_b, tt_f)
    # explicit caller tt is respected (the tuning escape hatch)
    bt2, tt2 = pt.pick_tiles(32, 10240, H, mid.layers,
                             mid.residual_channels, None, 2048,
                             G=mid.gate_channels, k=mid.kernel_size,
                             S=mid.skip_out_channels, cin=mid.cin_channels)
    assert tt2 == 2048


def test_bt_repick_after_tt_roundup(monkeypatch):
    """Env tile overrides that trigger the multiple-of-Tt_f round-up must
    re-gate Bt at the FINAL backward tile size (ADVICE r4: a Bt chosen
    under the original tt could re-enter the compile cliffs after the
    round-up). FUSED_TT=96 with FUSED_TT_F=64 rounds the backward tile to
    128; the stack must still match the XLA oracle."""
    monkeypatch.setenv("FUSED_TT", "96")
    monkeypatch.setenv("FUSED_TT_F", "64")
    spec = _spec()
    blocks, x0, c = _setup(spec, B=4, T=96)
    ref = np.asarray(_xla_stack(blocks, spec, x0, c))
    got = np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, dtype=jnp.float32, interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-5)


def test_oversized_config_falls_back_to_xla():
    """A 512-channel config cannot fit the fused backward on one chip —
    apply_wavenet must warn and use the XLA layer loop, matching it
    exactly (rather than dying in the Mosaic compiler)."""
    import warnings as _w
    from wavenet_vocoder_tpu.models.wavenet import apply_wavenet
    from wavenet_vocoder_tpu.models.wavenet import init_wavenet as _init

    big = WaveNetSpec(out_channels=30, layers=24, stacks=4,
                      residual_channels=512, gate_channels=512,
                      skip_out_channels=256, cin_channels=8,
                      scalar_input=True, output_distribution="Logistic",
                      fused_train=True)
    assert not pt.fused_train_fits(big, 4096)
    small = _spec()
    assert pt.fused_train_fits(small, 4096)

    params = _init(jax.random.PRNGKey(0), big)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.uniform(-0.5, 0.5, (1, 64, 1)).astype(np.float32))
    c = jnp.asarray(rs.randn(1, 64, 8).astype(np.float32))
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        out = apply_wavenet(params, big, x, c=c)
    assert any("XLA layer loop" in str(w.message) for w in rec)
    import dataclasses
    ref = apply_wavenet(params, dataclasses.replace(big, fused_train=False),
                        x, c=c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_dropout_mask_keep_rate():
    """Statistical sanity: mean keep-rate ~= keep; two seeds decorrelate."""
    m1 = np.asarray(pt.dropout_mask(jnp.int32(7), Bt=8, E=512, R=64, L=4,
                                    l=1, b0=0, t0=0, keep=0.7))
    m2 = np.asarray(pt.dropout_mask(jnp.int32(8), Bt=8, E=512, R=64, L=4,
                                    l=1, b0=0, t0=0, keep=0.7))
    assert abs(m1.mean() - 0.7) < 0.01, m1.mean()
    assert abs(m2.mean() - 0.7) < 0.01, m2.mean()
    # different seeds -> essentially independent masks
    agree = (m1 == m2).mean()
    assert abs(agree - (0.7 * 0.7 + 0.3 * 0.3)) < 0.02, agree


def test_fused_dropout_sharded_matches_single_device():
    """Dropout masks are keyed on GLOBAL batch rows (each shard passes its
    row offset into the kernel), so the sharded run must be bit-identical
    to the single-device run on the whole global batch — and two devices
    fed the SAME data must still produce different outputs (no cross-device
    mask aliasing; ADVICE r4 found seed+axis_index aliased via XOR)."""
    if jax.device_count() < 2:
        pytest.skip("needs >=2 devices")
    from wavenet_vocoder_tpu.parallel import make_mesh

    spec = _spec()
    blocks, x0, c = _setup(spec, B=4, T=96)
    mesh = make_mesh({"data": 2}, devices=jax.devices()[:2])
    kw = dict(dtype=jnp.float32, Bt=1, Tt=32, dropout=0.4, seed=SEED,
              interpret=True)
    sharded = np.asarray(pt.fused_res_stack(
        x0, c, blocks, spec, mesh=mesh, **kw))
    single = np.asarray(pt.fused_res_stack(x0, c, blocks, spec, **kw))
    # ALL rows (both shards) == single-device on the same global batch
    np.testing.assert_allclose(sharded, single, atol=2e-5, rtol=1e-5)
    # identical data on every row: every pair of rows must still differ
    # (each global row has its own mask — nothing aliases across shards)
    x_same = jnp.tile(x0[:1], (4, 1, 1))
    c_same = jnp.tile(c[:1], (4, 1, 1))
    out_same = np.asarray(pt.fused_res_stack(
        x_same, c_same, blocks, spec, mesh=mesh, **kw))
    for i in range(4):
        for j in range(i + 1, 4):
            assert np.abs(out_same[i] - out_same[j]).max() > 1e-3, (i, j)


def test_fused_train_step_with_dropout_runs():
    """End-to-end: fused_train + dropout>0 (the reference WaveNet class
    default is 0.05, wavenet.py:68) trains with finite loss and updates."""
    from wavenet_vocoder_tpu.config import Config
    from wavenet_vocoder_tpu.training.train_state import (
        create_train_state, make_train_step)

    cfg = Config(input_type="raw", quantize_channels=65536, out_channels=30,
                 layers=4, stacks=2, residual_channels=16, gate_channels=32,
                 skip_out_channels=24, cin_channels=8,
                 upsample_conditional_features=False, dropout=0.05,
                 compute_dtype="", lr_schedule="", fused_train=True)
    rs = np.random.RandomState(0)
    B, T = 2, 96
    x = rs.uniform(-0.5, 0.5, (B, T, 1)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "y": jnp.asarray(x.copy()),
             "c": jnp.asarray(rs.randn(B, T, 8).astype(np.float32)),
             "input_lengths": jnp.asarray([T, T], jnp.int32)}
    state = create_train_state(cfg)
    step, _ = make_train_step(cfg)
    p0 = jax.tree.leaves(state.params)[0]
    for _ in range(2):
        state, m = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
    assert not np.allclose(np.asarray(jax.tree.leaves(state.params)[0]),
                           np.asarray(p0))


def test_fault_injection_corrupts_gradients(monkeypatch):
    """The WN_FAULT knobs (used by scripts/quality_check.py to prove the
    quality net can fail) must actually perturb the backward: gradients
    with a fault differ from healthy ones; healthy runs are unaffected."""
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(7)
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def grad_with(fault):
        jax.clear_caches()  # WN_FAULT is read at kernel-BUILD time
        if fault:
            monkeypatch.setenv("WN_FAULT", fault)
        else:
            monkeypatch.delenv("WN_FAULT", raising=False)

        def loss(x0_):
            return jnp.sum(pt.fused_res_stack(
                x0_, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
                dropout=0.3, seed=SEED, interpret=True) * w)
        return np.asarray(jax.grad(loss)(x0))

    g_ok = grad_with(None)
    g_ok2 = grad_with(None)
    np.testing.assert_array_equal(g_ok, g_ok2)
    for fault in ("bwd_mask_tshift", "bwd_bnd_roll"):
        g_bad = grad_with(fault)
        assert np.abs(g_bad - g_ok).max() > 1e-4, fault
    grad_with(None)  # leave the process fault-free


def test_fused_gradients_xs_hbm(monkeypatch):
    """xs_hbm=True (backward phase 1 replaced by the forward's HBM x-stash,
    VERDICT r4 #6): outputs AND all gradients must match the masked-XLA
    oracle, including with dropout and with backward tiles larger than the
    forward's (halo heads read from the NEXT tile's stash)."""
    monkeypatch.setenv("FUSED_ACT_STASH", "0")
    monkeypatch.setenv("FUSED_XS_HBM", "1")
    jax.clear_caches()
    spec = _spec()
    blocks, x0, c = _setup(spec, T=160)
    rs = np.random.RandomState(7)
    w = jnp.asarray(rs.randn(2, 160, spec.skip_out_channels)
                    .astype(np.float32))

    def loss_fused(blocks, x0, c):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec, dtype=jnp.float32, Bt=2, Tt=32,
            dropout=0.3, seed=SEED, interpret=True) * w)

    def loss_xla(blocks, x0, c):
        return jnp.sum(_xla_stack_masked(blocks, spec, x0, c, SEED, 0.3) * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(blocks, x0, c)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(blocks, x0, c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)

    # no dropout + global conditioning through the same path
    g2 = jnp.asarray(np.random.RandomState(3).randn(2, 6).astype(np.float32))
    spec_g = _spec(gin_channels=6, use_speaker_embedding=False)
    blocks_g, x0g, cg = _setup(spec_g, T=160)

    def loss_fused_g(blocks, x0, c, g):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec_g, g=g, dtype=jnp.float32, Bt=1, Tt=64,
            interpret=True) * w[:, :, :spec_g.skip_out_channels])

    def loss_xla_g(blocks, x0, c, g):
        return jnp.sum(_xla_stack(blocks, spec_g, x0, c, g)
                       * w[:, :, :spec_g.skip_out_channels])

    g_ref = jax.grad(loss_xla_g, argnums=(0, 1, 2, 3))(blocks_g, x0g, cg, g2)
    g_got = jax.grad(loss_fused_g, argnums=(0, 1, 2, 3))(blocks_g, x0g, cg,
                                                         g2)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)
    jax.clear_caches()  # drop env-dependent kernels from the jit cache


def test_fused_forward_value_xs_hbm_matches(monkeypatch):
    """The primal value under xs_hbm equals the plain path (the extra
    stash outputs must not perturb skips) across uneven T/tile shapes."""
    monkeypatch.setenv("FUSED_ACT_STASH", "0")
    jax.clear_caches()
    spec = _spec()
    blocks, x0, c = _setup(spec, T=100)
    w = jnp.asarray(np.random.RandomState(1)
                    .randn(2, 100, spec.skip_out_channels).astype(np.float32))

    def val(xs):
        monkeypatch.setenv("FUSED_XS_HBM", "1" if xs else "0")
        jax.clear_caches()

        def loss(x0_):
            return jnp.sum(pt.fused_res_stack(
                x0_, c, blocks, spec, dtype=jnp.float32, Bt=1, Tt=32,
                dropout=0.2, seed=SEED, interpret=True) * w)
        v, g = jax.value_and_grad(loss)(x0)
        return np.asarray(v), np.asarray(g)

    v0, g0 = val(False)
    v1, g1 = val(True)
    np.testing.assert_allclose(v1, v0, rtol=1e-6)
    np.testing.assert_allclose(g1, g0, atol=2e-5, rtol=1e-5)
    jax.clear_caches()


def test_fused_gradients_xs_hbm_stride_and_ragged(monkeypatch):
    """xs_hbm with backward tiles LARGER than the forward's (stride 2) and
    T not a multiple of Tt_b: the forward must write every xsf row / xsh
    head slot the backward reads (r5 review: the unwritten tail produced
    NaN gradients at exactly this shape — T=96, Tt_f=32, Tt_b=64)."""
    monkeypatch.setenv("FUSED_ACT_STASH", "0")
    monkeypatch.setenv("FUSED_XS_HBM", "1")
    monkeypatch.setenv("FUSED_TT", "64")
    monkeypatch.setenv("FUSED_TT_F", "32")
    jax.clear_caches()
    spec = _spec()
    blocks, x0, c = _setup(spec, T=96)
    rs = np.random.RandomState(9)
    w = jnp.asarray(rs.randn(2, 96, spec.skip_out_channels)
                    .astype(np.float32))

    def loss_fused(blocks, x0, c):
        return jnp.sum(pt.fused_res_stack(
            x0, c, blocks, spec, dtype=jnp.float32,
            dropout=0.3, seed=SEED, interpret=True) * w)

    def loss_xla(blocks, x0, c):
        return jnp.sum(_xla_stack_masked(blocks, spec, x0, c, SEED, 0.3) * w)

    g_ref = jax.grad(loss_xla, argnums=(0, 1, 2))(blocks, x0, c)
    g_got = jax.grad(loss_fused, argnums=(0, 1, 2))(blocks, x0, c)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_got)):
        assert np.isfinite(np.asarray(b)).all()
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=3e-4, rtol=2e-4)
    jax.clear_caches()
