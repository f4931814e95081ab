"""Fused residual-stack kernel for TRAINING (forward + custom backward).

Why: the XLA train step is HBM-bandwidth bound (see bench.py roofline:
133.7GB/step at B=32 ≈ the measured step time at 819GB/s). Each of the 24
residual blocks round-trips its activations through HBM — z (B,T,G), gated,
out/skip projections. This kernel computes the WHOLE stack per (batch, time)
tile inside VMEM: HBM traffic drops to x0/c in + skips out + parameter
gradients, an order of magnitude fewer bytes.

Structure (forward):
  * grid = (n_bt, n_tt) over batch tiles x time tiles; TPU grids execute
    in lexicographic order (ti fastest), so the kernel keeps a per-layer
    VMEM CARRY of the last ``pad = (k-1)*max_dil`` columns of every x_l —
    each tile's dilated convs read [carry | tile] and the carry is
    refreshed with the tile's tail. ZERO redundant FLOPs (the r3 kernel
    recomputed a left halo of H = sum((k-1)*d) positions per tile instead)
    and exact causal semantics for free (the carry starts at zero).
  * per layer: causal dilated conv as k static-shifted matmuls over the
    carry-extended tile + cond 1x1 + GLU + fused (out|skip) matmul; skips
    accumulate in f32 in VMEM.
  * when training (emit_bnd), the carry snapshot at each tile start — the
    exact pad-wide boundary columns of every x_l — is written to HBM
    (L*B*n_tt*pad*R bf16, ~tens of MB) so the backward kernel can
    reconstruct the x_l chain with NO left halo at all.
  * the residual output of the last block is discarded, matching
    apply_wavenet (the head consumes only the skip sum;
    reference: wavenet.py:199-205).

Backward (custom_vjp): RIGHT-extended tiles E = Tt + H (dz at up to H
positions past the tile feeds dx inside it); the x_l chain is recomputed
per tile from the forward's boundary stash (flash-attention-style, but with
exact boundaries instead of a second halo), dz walks the layers top-down,
dW/dc accumulate masked to each tile's home region so boundary-spanning
contributions are counted exactly once. See _bwd kernel.

Scope: local and global conditioning optional; dropout supported end-to-end
via a counter-based mask keyed on absolute (batch, time, layer, channel)
indices, reproduced exactly by the backward kernel (reference applies
dropout to each block's conv input: modules.py:126-128).

Reference semantics being fused: modules.py:115-163 (ResidualConv1dGLU),
wavenet.py:187-205 (layer loop + skip scaling).
"""
from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT_HALF = math.sqrt(0.5)

# VMEM budget constants (one place; the relationships are load-bearing):
#  * VMEM_COMPILE_LIMIT_BYTES is the scoped-VMEM limit both kernels request
#    from Mosaic (pltpu.CompilerParams). v5e physical VMEM takes >=110MB
#    fine; 122MB is the measured-safe setting.
#  * VMEM_TILE_GATE_BYTES gates tile/stash CHOICES (pick_tiles, the
#    act-stash auto-enable) and must sit BELOW the compile limit — a config
#    the gates admit must never die in the Mosaic compiler.
#  * BWD_EST_PROVEN_BYTES is the largest Bt=1/no-stash bwd_vmem_estimate
#    PROVEN to compile and run on v5e: the flagship's Tt=2048 backward
#    (est 124.6MB — the estimator overshoots; the kernel fits the 122MB
#    scoped limit). pick_tiles shrinks Tt until the estimate is back under
#    this boundary, so middle-zone configs (est above it at the default
#    tile) ride a proven-size tile instead of dying in the Mosaic
#    compiler (VERDICT r4 #3).
#  * FUSED_FITS_GATE_BYTES is fused_train_fits' feasibility cut at Bt=1
#    AND the minimum time tile — deliberately loose (estimator overshoot
#    grows at small tiles); only hopeless configs fall back to XLA.
VMEM_COMPILE_LIMIT_BYTES = 122 * 2 ** 20
VMEM_TILE_GATE_BYTES = 118 * 2 ** 20
BWD_EST_PROVEN_BYTES = 126 * 2 ** 20
# the xs_hbm backward drops phase 1, so the estimator's body coefficient
# (fitted to the recompute kernel's liveness) overshoots it much further:
# est 139.5MB (flagship Tt=2048) AND est 163.4MB (Tt=2560) both compile
# and RUN on v5e under the 122MB scoped limit (r5 measurements) — the
# xs-path shrink boundary sits at the larger proven point so the flagship
# keeps Tt=2048 (its fastest measured tile: 0.0883 s/step B=32).
BWD_EST_PROVEN_XS_BYTES = 164 * 2 ** 20
# FUSED_FITS_GATE gates the RECOMPUTE path only: a config whose xs
# estimate cannot reach the xs proven boundary falls back to the
# recompute kernel at runtime (fused_res_stack), so the fits decision is
# always judged against the kernel that would actually run as fallback.
FUSED_FITS_GATE_BYTES = 160 * 2 ** 20
assert VMEM_TILE_GATE_BYTES < VMEM_COMPILE_LIMIT_BYTES
assert VMEM_COMPILE_LIMIT_BYTES < BWD_EST_PROVEN_BYTES < FUSED_FITS_GATE_BYTES
assert BWD_EST_PROVEN_BYTES < BWD_EST_PROVEN_XS_BYTES
# default for the fwd->bwd x-chain HBM stash (FusedStatics.xs_hbm); env
# FUSED_XS_HBM=0/1 overrides. Measured on v5e-1 (flagship, r5, final
# Tt=2048 tiles): B=32 0.0883 s/step vs 0.1021 recompute (MFU 35.7% ->
# 41.3%), B=64 0.1691 vs 0.1972 (37.0% -> 43.2%, 3.87M samples/s); HBM
# stays ~7x under the roofline.
XS_HBM_DEFAULT = True


@dataclasses.dataclass(frozen=True)
class FusedStatics:
    """All static (shape/config) arguments of the fused stack, bundled so the
    forward call, backward call, and the custom-VJP plumbing share ONE
    signature — a new static is added here once instead of threading a 15th
    positional through four call sites. Hashable -> jit-static."""
    L: int
    k: int
    R: int
    G: int
    S: int
    cin: int
    has_g: bool
    dils: Tuple[int, ...]
    Bt_f: int
    Tt_f: int
    Bt_b: int
    Tt_b: int
    dtype_name: str
    interpret: bool = False
    drop: float = 0.0
    # stash (tanh a, sigmoid b) in backward phase 1 so phase 2 skips the
    # whole in_proj recompute — costs 2*L*Bt*E*G2 VMEM bytes, so it is
    # auto-enabled only when the estimate fits (see bwd_vmem_estimate)
    act_stash: bool = True
    # ship every layer's input x_l from the forward to the backward through
    # HBM (full tiles + per-tile heads) so backward phase 1 — the full
    # x-chain recompute over the right-extended window — disappears
    # entirely. Trades HBM bytes (~12x under the roofline at flagship, see
    # bench.py) for ~1.25x-forward-pass FLOPs (VERDICT r4 #6). Only used
    # with act_stash=False (the flagship path; with the act stash phase 1
    # must run anyway to fill it).
    xs_hbm: bool = False


def stack_receptive(dilations: Tuple[int, ...], k: int) -> int:
    return sum((k - 1) * d for d in dilations)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def pick_tiles(B: int, T: int, H: int, L: int, R: int,
               bt: Optional[int] = None,
               tt: Optional[int] = None,
               G: Optional[int] = None, *,
               k: int = 3, S: Optional[int] = None,
               cin: int = -1, xs_hbm: bool = False) -> Tuple[int, int]:
    """Pick (Bt, Tt) for the BACKWARD kernel. The right-halo overhead is
    (Tt+H)/Tt, so Tt should be a few x H — measured on v5e (flagship,
    H=504): Tt=2048 beats 1024 and 4096 (the bigger stashes lose more to
    VMEM pressure than the smaller halo gains). Bt is the largest divisor
    of B whose whole-kernel VMEM estimate (body temporaries + x-stash +
    accumulators, see bwd_vmem_estimate) fits the chip."""
    if G is None:
        G = 2 * R
    if S is None:
        S = R
    tt_given = tt is not None
    if tt is None:
        tt = min(_round_up(max(4 * H, 1024), 256), _round_up(T, 256))
    if bt is None:
        limit = VMEM_TILE_GATE_BYTES
        # Bt*E also caps the Mosaic compile: a 12L config at Bt*E ~ 5100
        # sat in the compiler for >45 min through the relay, while the
        # flagship's 2552 compiles in ~20; keep tiles at that proven scale.
        # And Bt > 1 makes every (Bt, E, C) -> (Bt*E, C) reshape a real
        # relayout unless E is sublane-tile aligned — an UNALIGNED Bt=2
        # (E=1276) got the compile helper SIGKILLed; Bt=1 reshapes are free
        # for any E.
        rows = 4096
        bt = 1
        for cand in range(2, B + 1):
            if B % cand or (tt + H) % 16:
                continue
            if (cand * (tt + H) <= rows
                    and bwd_vmem_estimate(L=L, k=k, R=R, G=G, S=S, cin=cin,
                                          Bt=cand, E=tt + H, act_stash=False,
                                          xs_hbm=xs_hbm, H=H) <= limit):
                bt = cand
        if bt == 1 and not tt_given:
            # middle-zone configs (estimate above the PROVEN boundary even
            # at Bt=1): the estimate is ~linear in E = tt + H, so shrink
            # the time tile until it is back at a proven-to-compile size.
            # The flagship (est 124.6MB recompute / 139.5MB xs at its
            # measured-optimal Tt=2048) sits just under the respective
            # boundary and is untouched. The caller may round tt back up
            # to pad — the irreducible floor — in which case the loose
            # fused_train_fits gate decides.
            proven = (BWD_EST_PROVEN_XS_BYTES if xs_hbm
                      else BWD_EST_PROVEN_BYTES)
            while tt > 256 and bwd_vmem_estimate(
                    L=L, k=k, R=R, G=G, S=S, cin=cin, Bt=1, E=tt + H,
                    act_stash=False, xs_hbm=xs_hbm,
                    H=H) > proven:
                tt -= 256
    return bt, tt


def pick_tiles_fwd(B: int, T: int, H: int, L: int, R: int, G: int, S: int,
                   cin: int,
                   bt: Optional[int] = None,
                   tt: Optional[int] = None,
                   xs_hbm: bool = False) -> Tuple[int, int]:
    """Pick (Bt, Tt) for the FORWARD kernel. Without xs emission the batch
    tile is bounded by the live working set per grid step (double-buffered
    input tiles + f32 skip/z temporaries), which lets it run several batch
    rows per tile — fewer grid steps, taller matmuls. With xs_hbm the
    kernel ALSO streams out every layer's x_l (home tile + halo head,
    double-buffered output blocks) — ~20MB/batch-row at flagship scale,
    which this budget must count or the forward OOMs VMEM (measured r5:
    136.5MB > 128MB at Bt=4)."""
    if tt is None:
        tt = min(_round_up(max(4 * H, 1024), 256), _round_up(T, 256))
    if bt is None:
        # rough live bytes per batch row: x0/c tiles (bf16, double-
        # buffered), carry-extended tap buffer, f32 z + skips + y temporaries
        per_b = tt * (2 * 2 * (R + max(cin, 0)) + 2 * R
                      + 4 * (G + S + R + S))
        if xs_hbm:
            per_b += 2 * (tt + _round_up(H, 8)) * L * R * 2
        budget = 56 * 2 ** 20
        bt = max(1, min(B, budget // max(per_b, 1)))
        while B % bt:
            bt -= 1
    return bt, tt


def resolve_tiles(B_loc: int, T: int, H: int, L: int, R: int, *, G: int,
                  k: int, S: int, cin: int, dils: Tuple[int, ...],
                  bt_b=None, tt_b=None, bt_f=None, tt_f=None,
                  xs_hbm: bool = False) -> Tuple[int, int, int, int]:
    """Resolve the FINAL (Bt_f, Tt_f, Bt_b, Tt_b) the kernels will use,
    including every cross-constraint — extracted from fused_res_stack so
    the interactions are testable without running a kernel:

    * the forward carry / boundary stash needs Tt_f >= pad;
    * the backward reads boundaries written at FORWARD tile starts, so
      Tt_b must be a multiple of Tt_f;
    * when Tt_b was VMEM-shrunk (the middle-zone path) the DEFAULT Tt_f is
      capped at Tt_b first, so the multiple-of round-up cannot grow Tt_b
      back past the proven estimate (r5 review: the cap was originally
      gated on xs_hbm, silently re-opening the middle zone on the default
      path);
    * if the round-up still grew Tt_b (explicit tt_f overrides), Bt_b is
      re-gated at the FINAL tile size (ADVICE r4)."""
    Bt_b, Tt_b = pick_tiles(B_loc, T, H, L, R, bt_b, tt_b, G=G,
                            k=k, S=S, cin=cin, xs_hbm=xs_hbm)
    Bt_f, Tt_f = pick_tiles_fwd(B_loc, T, H, L, R, G, S, cin, bt_f, tt_f,
                                xs_hbm=xs_hbm)
    pad = max((k - 1) * d for d in dils)
    if tt_f is None:
        Tt_f = min(Tt_f, Tt_b)
    Tt_f = max(Tt_f, _round_up(pad, 8))
    Tt_b_picked = Tt_b
    Tt_b = max(Tt_b, Tt_f)
    if Tt_b % Tt_f:
        Tt_b = _round_up(Tt_b, Tt_f)
    if Tt_b != Tt_b_picked and bt_b is None:
        Bt_b = pick_tiles(B_loc, T, H, L, R, None, Tt_b, G=G, k=k, S=S,
                          cin=cin, xs_hbm=xs_hbm)[0]
    return Bt_f, Tt_f, Bt_b, Tt_b


def bwd_vmem_estimate(*, L: int, k: int, R: int, G: int, S: int, cin: int,
                      Bt: int, E: int, act_stash: bool,
                      xs_hbm: bool = False, H: int = 0) -> int:
    """Rough VMEM bytes for one backward grid step. The body-temporaries
    coefficient is fitted to a measured Mosaic allocation (82.9MB at
    Bt*E=2552, R=128, G=256, S=128 -> ~16*(R+G+S) live f32 channels per
    position); used only to auto-gate the activation stash, so it needs to
    be conservative, not exact. With xs_hbm the x-chain arrives as two
    double-buffered DMA windows (home tile + halo head) instead of the
    recompute scratch."""
    c = max(cin, 0)
    body = Bt * E * 4 * 16 * (R + G + S)
    if xs_hbm:
        # double-buffered (L,Bt,Tt,R) home + (L,Bt,Hp,R) head inputs, bf16
        xs = 2 * (L * Bt * (E - H) * R * 2 + L * Bt * _round_up(H, 8) * R * 2)
    else:
        xs = L * Bt * E * R * 2
    act = 2 * L * Bt * E * (G // 2) * 2 if act_stash else 0
    accums = 4 * (L * k * R * G + L * G + L * c * G
                  + L * (G // 2) * (R + S) + L * (R + S))
    windows = 2 * (Bt * E * (R + c) * 2 * 2 + Bt * E * S * 4 * 2)
    weights = 2 * (L * k * R * G + L * c * G + L * (G // 2) * (R + S))
    return body + xs + act + accums + windows + weights


def fused_train_fits(spec, T: int) -> bool:
    """Loose single-chip feasibility check for the fused train kernels.

    False for configs whose BACKWARD cannot fit VMEM even at Bt=1 — e.g.
    512-channel WaveNets, where the f32 dW accumulators alone (~75MB) plus
    the x-stash exceed the chip. The estimator is crude (fitted at flagship
    scale, see bwd_vmem_estimate), so the threshold is deliberately loose:
    only hopeless configs are rejected; callers fall back to the XLA layer
    loop with a warning (models/wavenet.py)."""
    H = stack_receptive(spec.dilations, spec.kernel_size)
    _, tt = pick_tiles(1, T, H, spec.layers, spec.residual_channels,
                       G=spec.gate_channels, k=spec.kernel_size,
                       S=spec.skip_out_channels,
                       cin=spec.cin_channels)
    est = bwd_vmem_estimate(
        L=spec.layers, k=spec.kernel_size, R=spec.residual_channels,
        G=spec.gate_channels, S=spec.skip_out_channels,
        cin=spec.cin_channels if spec.has_local_conditioning else -1,
        Bt=1, E=tt + H, act_stash=False)
    return est <= FUSED_FITS_GATE_BYTES


def _mix_bits(x: jnp.ndarray) -> jnp.ndarray:
    """Integer mix (murmur3-style finalizer) on int32 with logical shifts —
    wrapping int32 multiplies equal uint32 multiplies mod 2^32, so this is
    a well-distributed 32-bit hash expressible in Mosaic-supported ops."""
    srl = jax.lax.shift_right_logical
    x = x ^ srl(x, 16)
    x = x * np.int32(0x45d9f3b)
    x = x ^ srl(x, 15)
    x = x * np.int32(0x119de1f3)
    x = x ^ srl(x, 16)
    return x


def dropout_mask(seed: jnp.ndarray, *, Bt: int, E: int, R: int, L: int,
                 l: int, b0, t0, keep: float) -> jnp.ndarray:
    """Deterministic per-element dropout mask over a (Bt, E, R) tile.

    Counter-based: keyed on ABSOLUTE (batch, time, layer, channel) indices,
    so the forward and backward kernels reproduce identical masks on
    different tile shapes/halos (t0 must be the absolute t-key of window
    position 0). Two hash rounds: the batch row is mixed with the seed into
    a per-row key, then the (t, l, r) index is mixed in — a single linear
    combination would overflow int32 once batch*(T+H)*L*R > 2^32 and alias
    masks between rows. (t*L + l)*R + r itself stays well under 2^31 for
    any realistic crop. `seed` is an int32 scalar. Returns a f32 {0,1}
    mask; caller scales by 1/keep."""
    i32 = jnp.int32
    bi_ = jax.lax.broadcasted_iota(i32, (Bt, E, R), 0) + b0
    ti_ = jax.lax.broadcasted_iota(i32, (Bt, E, R), 1) + t0
    ri_ = jax.lax.broadcasted_iota(i32, (Bt, E, R), 2)
    bkey = _mix_bits(bi_ ^ seed)
    idx = (ti_ * np.int32(L) + np.int32(l)) * np.int32(R) + ri_
    u = _mix_bits(bkey ^ idx)
    # unsigned compare via the top 24 bits (non-negative after logical srl)
    v = jax.lax.shift_right_logical(u, 8)
    thresh = np.int32(min(int(keep * (1 << 24)), (1 << 24)))
    return (v < thresh).astype(jnp.float32)


def _make_fwd_kernel(*, L: int, k: int, R: int, G: int, S: int, cin: int,
                     has_g: bool, dils: Tuple[int, ...], Bt: int,
                     Tt: int, dtype, drop: float = 0.0,
                     emit_bnd: bool = False, emit_xs: bool = False):
    G2 = G // 2
    has_c = cin > 0
    has_drop = drop > 0.0
    keep = 1.0 - drop
    pad = max((k - 1) * d for d in dils)
    H = stack_receptive(dils, k)
    Hp = _round_up(H, 8)

    def kernel(x0_ref,                      # (Bt, Tt, R)
               c_ref,                       # (Bt, Tt, cin) or (1,1,1)
               gb_ref,                      # (L, Bt, G) f32 or (1,1,1)
               seed_ref,                    # (1, 2) int32 (SMEM): seed, boff
               w_in_ref, b_in_ref,          # (L, k*R, G), (L, G)
               w_cond_ref,                  # (L, cin, G) or (1,1,1)
               w_og_ref, b_og_ref,          # (L, G2, R+S), (L, R+S)
               skips_ref,                   # out (Bt, Tt, S) f32
               *rest):                      # [bnd/xs outs] + carry scratch
        if emit_bnd and emit_xs:
            # xsf: (L, Bt, Tt, R) home tiles of every layer's input;
            # xsh: (1, L, Bt, Hp, R) per-fwd-tile heads (the backward's
            # right-halo windows) — together they replace backward phase 1
            bnd_ref, xsf_ref, xsh_ref, carry = rest
        elif emit_bnd:
            bnd_ref, carry = rest           # (1, L, Bt, pad, R), scratch
        else:
            (carry,) = rest                 # scratch (L, Bt, pad, R) dtype
        ti = pl.program_id(1)

        # the carry holds x_l[t0-pad : t0] per layer — exact causal history
        # from the previous grid step (TPU grids run ti in ascending order).
        # t < 0 is exact zeros (every layer's conv zero-pads).
        @pl.when(ti == 0)
        def _reset():
            carry[...] = jnp.zeros_like(carry)

        x = x0_ref[...].astype(jnp.float32)   # (Bt, Tt, R)
        ct = None
        if has_c:
            ct = c_ref[...].astype(dtype).reshape(Bt * Tt, cin)
        skips = jnp.zeros((Bt, Tt, S), jnp.float32)
        if has_drop:
            seed = seed_ref[0, 0]
            # seed_ref[0, 1] = global row offset of this shard (shard_map)
            b0 = pl.program_id(0) * Bt + seed_ref[0, 1]

        for l in range(L):
            d = dils[l]
            w_l = w_in_ref[l]               # (k*R, G)
            bnd_l = carry[l]                # (Bt, pad, R) in carry dtype
            if emit_bnd:
                bnd_ref[0, l] = bnd_l
            if emit_bnd and emit_xs:
                xsf_ref[l] = x.astype(xsf_ref.dtype)
                xsh_ref[0, l] = x[:, :Hp].astype(xsh_ref.dtype)
            # refresh the carry with this tile's tail BEFORE x advances
            carry[l] = x[:, Tt - pad:].astype(carry.dtype)
            # Under dropout, round the interior to the CARRY dtype before
            # the mask scale so every window position is compute-dtype-
            # rounded at the same point — the backward then reproduces conv
            # inputs bit-exactly across forward-tile boundaries under bf16
            # (ADVICE r4: scale-then-round vs round-then-scale differed by
            # ~1 ulp at carry columns). Without dropout the later xpd cast
            # already rounds identically — skip the extra casts there.
            x_rt = (x.astype(carry.dtype).astype(jnp.float32)
                    if has_drop else x)
            xp = jnp.concatenate(
                [bnd_l.astype(jnp.float32), x_rt],
                axis=1)                                  # (Bt, pad+Tt, R)
            if has_drop:
                # dropout on the conv INPUT only; the residual passthrough
                # uses the un-dropped x (reference: modules.py:126-128).
                # Keys are absolute, so the carry columns get the same bits
                # they had as home positions of the previous tile.
                # key of position 0 = absolute (ti*Tt - pad) + H
                m = dropout_mask(seed, Bt=Bt, E=pad + Tt, R=R, L=L, l=l,
                                 b0=b0, t0=ti * Tt - pad + H,
                                 keep=keep)
                xp = xp * (m * (1.0 / keep))
            xpd = xp.astype(dtype)
            bias = jnp.zeros((Bt, 1, G), jnp.float32) + b_in_ref[l]
            if has_g:
                # global conditioning: time-constant per-(batch,layer) bias
                # (cond_g 1x1 on a constant vector; computed in XLA)
                bias = bias + gb_ref[l][:, None, :]
            z = (jnp.zeros((Bt, Tt, G), jnp.float32)
                 + bias).reshape(Bt * Tt, G)
            for j in range(k):
                off = pad - (k - 1 - j) * d
                tap = xpd[:, off:off + Tt].reshape(Bt * Tt, R)
                z = z + jnp.dot(tap, w_l[j * R:(j + 1) * R],
                                preferred_element_type=jnp.float32)
            if has_c:
                z = z + jnp.dot(ct, w_cond_ref[l],
                                preferred_element_type=jnp.float32)
            a, b = z[:, :G2], z[:, G2:]
            gated = (jnp.tanh(a) * jax.nn.sigmoid(b)).astype(dtype)
            y = jnp.dot(gated, w_og_ref[l],
                        preferred_element_type=jnp.float32)
            y = y + b_og_ref[l]             # (Bt*Tt, R+S)
            skips = skips + y[:, R:].reshape(Bt, Tt, S)
            x = (y[:, :R].reshape(Bt, Tt, R)
                 + x) * _SQRT_HALF          # f32 residual accumulation

        skips_ref[...] = skips

    return kernel


@partial(jax.jit, static_argnames=("st", "emit_bnd"))
def _fwd_call(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, *, st,
              emit_bnd=False):
    """Returns skips (B, T, S) f32, or (skips, bnd) when emit_bnd — bnd is
    the (n_tt, L, B, pad, R) per-tile boundary stash the backward consumes."""
    L, k, R, G, S = st.L, st.k, st.R, st.G, st.S
    cin, has_g, dils = st.cin, st.has_g, st.dils
    Bt, Tt = st.Bt_f, st.Tt_f
    dtype_name, interpret = st.dtype_name, st.interpret
    drop = st.drop
    dtype = jnp.dtype(dtype_name)
    B, T, _ = x0.shape
    pad = max((k - 1) * d for d in dils)
    assert Tt >= pad, (Tt, pad)
    T_pad = _round_up(T, Tt)
    if emit_bnd and st.xs_hbm:
        # cover the BACKWARD's padding too (Tt_b is a multiple of Tt_f, so
        # this stays tile-aligned): every xsf row / xsh head slot the
        # backward can read must be WRITTEN — an unwritten HBM tail is
        # arbitrary garbage, and 0 * NaN poisons gradients even at
        # zero-cotangent positions (r5 review finding, repro'd)
        T_pad = _round_up(T, st.Tt_b)
    n_tt = T_pad // Tt
    n_bt = B // Bt

    # plain contiguous tiles — the carry makes halo copies unnecessary
    x0p = jnp.pad(x0.astype(dtype), ((0, 0), (0, T_pad - T), (0, 0)))
    if cin > 0:
        cp = jnp.pad(c.astype(dtype), ((0, 0), (0, T_pad - T), (0, 0)))
    else:
        cp = jnp.zeros((1, 1, 1), dtype)

    emit_xs = bool(emit_bnd and st.xs_hbm)
    kernel = _make_fwd_kernel(L=L, k=k, R=R, G=G, S=S, cin=cin, has_g=has_g,
                              dils=dils, Bt=Bt, Tt=Tt, dtype=dtype,
                              drop=drop, emit_bnd=emit_bnd, emit_xs=emit_xs)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((Bt, Tt, R), lambda bi, ti: (bi, ti, 0),
                          memory_space=pltpu.VMEM)
    c_spec = (pl.BlockSpec((Bt, Tt, cin), lambda bi, ti: (bi, ti, 0),
                           memory_space=pltpu.VMEM)
              if cin > 0 else
              pl.BlockSpec((1, 1, 1), lambda bi, ti: (0, 0, 0),
                           memory_space=pltpu.VMEM))
    gb_spec = (pl.BlockSpec((L, Bt, G), lambda bi, ti: (0, bi, 0),
                            memory_space=pltpu.VMEM)
               if has_g else
               pl.BlockSpec((1, 1, 1), lambda bi, ti: (0, 0, 0),
                            memory_space=pltpu.VMEM))
    seed_spec = pl.BlockSpec((1, 2), lambda bi, ti: (0, 0),
                             memory_space=pltpu.SMEM)

    out_specs = pl.BlockSpec((Bt, Tt, S), lambda bi, ti: (bi, ti, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((B, T_pad, S), jnp.float32)
    if emit_bnd:
        out_specs = (out_specs,
                     pl.BlockSpec((1, L, Bt, pad, R),
                                  lambda bi, ti: (ti, 0, bi, 0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((n_tt, L, B, pad, R), dtype))
    if emit_xs:
        # T_pad is rounded to Tt_b above, so the grid WRITES every row and
        # head slot the backward can read
        H_tot = stack_receptive(dils, k)
        Hp = _round_up(H_tot, 8)
        out_specs = out_specs + (
            pl.BlockSpec((L, Bt, Tt, R), lambda bi, ti: (0, bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Bt, Hp, R),
                         lambda bi, ti: (ti, 0, bi, 0, 0),
                         memory_space=pltpu.VMEM))
        out_shape = out_shape + (
            jax.ShapeDtypeStruct((L, B, T_pad, R), dtype),
            jax.ShapeDtypeStruct((n_tt, L, B, Hp, R), dtype))

    compiler_params = None
    if not interpret:
        # the unrolled 24-layer body holds several layers' temporaries live;
        # Mosaic's default 16MB scoped-VMEM limit is far below physical.
        # Sits ABOVE the tile/stash gates by construction (asserted at the
        # constant definitions) so gate-admitted configs always compile.
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_COMPILE_LIMIT_BYTES)
    out = pl.pallas_call(
        kernel,
        grid=(n_bt, n_tt),
        in_specs=[x_spec, c_spec, gb_spec, seed_spec,
                  full(), full(), full(), full(), full()],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((L, Bt, pad, R), dtype)],
        interpret=interpret,
        compiler_params=compiler_params,
    )(x0p, cp, gb, seed, w_in, b_in, w_cond, w_og, b_og)
    if emit_bnd:
        skips, *aux = out  # (bnd,) or (bnd, xsf, xsh) under xs_hbm
        return skips[:, :T], tuple(aux)
    return out[:, :T]


def pack_block_weights(folded_blocks, spec, dtype=jnp.float32):
    """Stack per-block FOLDED conv kernels for the fused kernel.

    folded_blocks: list of block param dicts whose convs are plain
    {"w": (K, In, Out), "b"} (weight norm already folded — folding stays in
    XLA so its gradient flows to (g, v) automatically).
    Returns (w_in (L,k*R,G), b_in (L,G), w_cond (L,cin,G)|dummy,
             w_og (L,G2,R+S), b_og (L,R+S)).
    """
    k = spec.kernel_size
    R = spec.residual_channels
    w_in = jnp.stack([bp["conv"]["w"].reshape(k * R, -1).astype(dtype)
                      for bp in folded_blocks])
    b_in = jnp.stack([bp["conv"]["b"].astype(jnp.float32)
                      for bp in folded_blocks])
    if spec.has_local_conditioning:
        w_cond = jnp.stack([bp["cond_c"]["w"][0].astype(dtype)
                            for bp in folded_blocks])
    else:
        w_cond = jnp.zeros((1, 1, 1), dtype)
    w_og = jnp.stack([jnp.concatenate(
        [bp["out"]["w"][0], bp["skip"]["w"][0]], axis=-1).astype(dtype)
        for bp in folded_blocks])
    b_og = jnp.stack([jnp.concatenate(
        [bp["out"]["b"], bp["skip"]["b"]]).astype(jnp.float32)
        for bp in folded_blocks])
    return w_in, b_in, w_cond, w_og, b_og


import os as _os


def fused_res_stack(x0: jnp.ndarray, c: Optional[jnp.ndarray],
                    folded_blocks, spec, *, g: Optional[jnp.ndarray] = None,
                    dtype=jnp.bfloat16,
                    Bt: Optional[int] = None, Tt: Optional[int] = None,
                    interpret: bool = False,
                    mesh=None, data_axis: str = "data",
                    dropout: float = 0.0,
                    seed: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Run the whole residual stack fused; returns skips (B, T, S) f32.

    x0: (B, T, R) output of first_conv; c: (B, T, cin) sample-rate
    conditioning or None; g: (B, gin) embedded global-conditioning vector
    or None — time-constant, so its cond_g 1x1 collapses to a per-layer
    (B, G) bias computed here in XLA (gradient flows to cond_g through the
    stack below). Gradients flow through a custom VJP with a fused backward
    kernel (see _bwd_call).

    dropout/seed: conv-input dropout inside every residual block (reference:
    modules.py:126-128). The mask is counter-based, keyed on ABSOLUTE
    (batch, time, layer, channel) indices from ``seed`` (a (1,1) int32
    array, one per step), so the forward and backward kernels reproduce
    identical masks on different tile shapes. dropout > 0 requires a seed.

    mesh: a jax.sharding.Mesh with a ``data_axis`` — GSPMD cannot partition
    Mosaic custom calls, so under a multi-device mesh the kernel is
    dispatched through shard_map over the batch (one independent kernel per
    device, no collectives in the stack; weight cotangents are psum'd by the
    shard_map transpose). Dropout masks are keyed on the GLOBAL batch row
    (each device passes its row offset into the kernel), so a sharded run
    is bit-identical to the single-device run on the same global batch."""
    L = spec.layers
    k = spec.kernel_size
    R = spec.residual_channels
    G = spec.gate_channels
    S = spec.skip_out_channels
    cin = spec.cin_channels if spec.has_local_conditioning else -1
    dils = spec.dilations
    B, T, _ = x0.shape
    H = stack_receptive(dils, k)
    n_dev = 1
    if mesh is not None and data_axis in mesh.axis_names:
        n_dev = mesh.shape[data_axis]
    if B % n_dev:
        raise ValueError(
            f"fused_train: batch {B} not divisible by mesh data axis "
            f"{n_dev}")
    B_loc = B // n_dev

    # tuning escape hatches for benchmarking tile shapes; FUSED_BT/FUSED_TT
    # set both kernels, FUSED_BT_F/FUSED_TT_F override the forward's.
    # Caller-passed Bt/Tt beat every env knob; resolved against the
    # ORIGINAL caller values so the _F overrides still apply when FUSED_BT/
    # FUSED_TT are also set (ADVICE r3).
    def _env(name):
        v = _os.environ.get(name)
        return int(v) if v else None

    bt_b = Bt if Bt is not None else _env("FUSED_BT")
    tt_b = Tt if Tt is not None else _env("FUSED_TT")
    bt_f = Bt if Bt is not None else (_env("FUSED_BT_F") or _env("FUSED_BT"))
    tt_f = Tt if Tt is not None else (_env("FUSED_TT_F") or _env("FUSED_TT"))
    # xs_hbm: ship the x-chain fwd->bwd through HBM so backward phase 1
    # vanishes (VERDICT r4 #6). Tiles are first resolved on the RECOMPUTE
    # path (the act-stash decision and every fallback must run on tiles
    # proven for THAT kernel, r5 review); if xs engages, they are
    # re-resolved under the xs estimate further below.
    xs_env = _os.environ.get("FUSED_XS_HBM")
    xs_want = bool(int(xs_env)) if xs_env else XS_HBM_DEFAULT
    Bt_f, Tt_f, Bt_b, Tt_b = resolve_tiles(
        B_loc, T, H, L, R, G=G, k=k, S=S, cin=max(cin, -1),
        bt_b=bt_b, tt_b=tt_b, bt_f=bt_f, tt_f=tt_f, xs_hbm=False,
        dils=dils)
    pad = max((k - 1) * d for d in dils)

    w_in, b_in, w_cond, w_og, b_og = pack_block_weights(
        folded_blocks, spec, dtype=dtype)
    if c is None and cin > 0:
        raise ValueError("spec has conditioning but c is None")
    c_arr = c if c is not None else jnp.zeros((1, 1, 1), x0.dtype)
    has_g = g is not None
    if has_g:
        # (L, B, G) time-constant bias; stays in the autodiff graph so
        # d(gbias) chains to cond_g weights (and the speaker embedding)
        gb = jnp.stack([
            jnp.dot(g.astype(jnp.float32),
                    bp["cond_g"]["w"][0].astype(jnp.float32))
            for bp in folded_blocks])
    else:
        gb = jnp.zeros((1, 1, 1), jnp.float32)
    drop = float(dropout)
    if drop > 0.0 and seed is None:
        raise ValueError("fused_res_stack: dropout > 0 requires a seed")
    # seed_arr packs [seed, batch_row_offset]; the offset shifts the mask's
    # batch keys to GLOBAL row indices under shard_map (0 on one device)
    seed_arr = jnp.concatenate(
        [(seed.reshape(1, 1).astype(jnp.int32) if seed is not None
          else jnp.zeros((1, 1), jnp.int32)),
         jnp.zeros((1, 1), jnp.int32)], axis=1)
    # activation stash: big phase-2 FLOP savings, but it adds
    # 2*L*Bt*E*G2 bf16 of VMEM — auto-enable only when the conservative
    # estimate fits the chip (flagship 24L/2048-tile does NOT; measured
    # 153.6MB > 128MB). FUSED_ACT_STASH=0/1 overrides for benching;
    # interpret mode (CPU tests) always exercises the stash path.
    E_b = Tt_b + H
    if _os.environ.get("FUSED_ACT_STASH"):
        act_stash = bool(int(_os.environ["FUSED_ACT_STASH"]))
    elif interpret:
        act_stash = True
    else:
        act_stash = bwd_vmem_estimate(
            L=L, k=k, R=R, G=G, S=S, cin=cin, Bt=Bt_b, E=E_b,
            act_stash=True) <= VMEM_TILE_GATE_BYTES

    # xs_hbm finalization: only on the no-act-stash path (the stash needs
    # phase 1 to fill it). When it engages, RE-resolve the tiles under the
    # xs estimate and its own proven boundary; if the xs estimate cannot
    # reach that envelope (or the per-fwd-tile halo head does not fit),
    # fall back to the recompute kernel on the tiles already proven for it
    # — no kernel variant ever runs on tiles gated for the other one.
    xs_hbm = bool(xs_want and not act_stash)
    if xs_hbm:
        tiles_xs = resolve_tiles(
            B_loc, T, H, L, R, G=G, k=k, S=S, cin=max(cin, -1),
            bt_b=bt_b, tt_b=tt_b, bt_f=bt_f, tt_f=tt_f, xs_hbm=True,
            dils=dils)
        est_xs = bwd_vmem_estimate(
            L=L, k=k, R=R, G=G, S=S, cin=cin, Bt=tiles_xs[2],
            E=tiles_xs[3] + H, act_stash=False, xs_hbm=True, H=H)
        if (tiles_xs[1] >= _round_up(H, 8)
                and (est_xs <= BWD_EST_PROVEN_XS_BYTES
                     or tt_b is not None)):
            Bt_f, Tt_f, Bt_b, Tt_b = tiles_xs
            E_b = Tt_b + H
        else:
            xs_hbm = False
    st = FusedStatics(L=L, k=k, R=R, G=G, S=S,
                      cin=(cin if c is not None else -1), has_g=has_g,
                      dils=dils, Bt_f=Bt_f, Tt_f=Tt_f, Bt_b=Bt_b, Tt_b=Tt_b,
                      dtype_name=jnp.dtype(dtype).name, interpret=interpret,
                      drop=drop, act_stash=act_stash, xs_hbm=xs_hbm)
    if n_dev == 1:
        return _fused_vjp(x0, c_arr, gb, seed_arr,
                          w_in, b_in, w_cond, w_og, b_og, st)

    from jax.sharding import PartitionSpec as P

    def body(x0_l, c_l, gb_l, seed_l, *ws):
        # shard_map sees LOCAL batch indices; pass the device's global row
        # offset so masks are keyed on GLOBAL rows — sharded dropout is then
        # bit-identical to the single-device run (a plain seed+axis_index
        # offset aliased masks across devices via XOR, ADVICE r4)
        boff = jax.lax.axis_index(data_axis).astype(jnp.int32) * \
            np.int32(B_loc)
        seed_l = seed_l + boff * jnp.array([[0, 1]], jnp.int32)
        return _fused_vjp(x0_l, c_l, gb_l, seed_l, *ws, st)

    in_specs = (P(data_axis),
                P(data_axis) if c is not None else P(),
                P(None, data_axis) if has_g else P(),
                P(),
                P(), P(), P(), P(), P())
    sm = jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                       out_specs=P(data_axis), check_vma=False)
    return sm(x0, c_arr, gb, seed_arr, w_in, b_in, w_cond, w_og, b_og)


@partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_vjp(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, st):
    return _fwd_call(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, st=st)


def _fused_fwd(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, st):
    out, aux = _fwd_call(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og,
                         st=st, emit_bnd=True)
    return out, (x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, aux)


def _fused_bwd(st, res, dskips):
    x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, aux = res
    if st.xs_hbm:
        bnd, xsf, xsh = aux
    else:
        (bnd,) = aux
        xsf = jnp.zeros((1, 1, 1, 1), jnp.dtype(st.dtype_name))
        xsh = jnp.zeros((1, 1, 1, 1, 1), jnp.dtype(st.dtype_name))
    grads = _bwd_call(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og,
                      bnd, xsf, xsh, dskips.astype(jnp.float32), st=st)
    # seed is integer-typed: its cotangent is a float0 zero (same shape
    # as the (1, 2) [seed, row_offset] primal)
    dseed = np.zeros((1, 2), jax.dtypes.float0)
    dx0, dc, dgb, dw_in, db_in, dw_cond, dw_og, db_og = grads
    return (dx0, dc, dgb, dseed, dw_in, db_in, dw_cond, dw_og, db_og)


_fused_vjp.defvjp(_fused_fwd, _fused_bwd)


# ----------------------------------------------------------------------
# backward
# ----------------------------------------------------------------------
def _make_bwd_kernel(*, L: int, k: int, R: int, G: int, S: int, cin: int,
                     has_g: bool, dils: Tuple[int, ...], Bt: int, E: int,
                     Tt: int, dtype, drop: float = 0.0,
                     act_stash: bool = True, xs_hbm: bool = False):
    """Per (bt, tt) tile: reconstruct the x_l chain on the RIGHT-extended
    window [t0, t0+Tt+H) — left history comes EXACTLY from the forward's
    per-layer boundary stash (bnd), so there is no left-halo recompute —
    then walk layers top-down computing dz, propagate dx via the transposed
    dilated conv (dz at up to H positions past the tile feeds home dx),
    and accumulate dW/dc masked to the home region [t0, t0+Tt) so
    boundary-spanning contributions are counted exactly once.

    Dropout: the forward drops each layer's conv INPUT (not the residual
    passthrough). The identical counter-based mask (absolute (b, t, l, r)
    keys) is re-applied over [t0-pad, t0+Tt+H): dW_in contracts against the
    DROPPED taps and the transposed-conv dx contribution chains through
    m/keep."""
    G2 = G // 2
    has_c = cin > 0
    has_drop = drop > 0.0
    keep = 1.0 - drop
    pad = max((k - 1) * d for d in dils)
    H = stack_receptive(dils, k)

    # test-only fault injection (WN_FAULT env, read at kernel-BUILD time —
    # set it before the first jitted step of the process): deliberately
    # subtle gradient bugs the quality net (scripts/quality_check.py) must
    # catch. "bwd_mask_tshift" regenerates the dropout mask one position
    # off (fwd/bwd mask mismatch; requires dropout > 0); "bwd_bnd_roll"
    # rolls the boundary stash by one time position (any config).
    fault = _os.environ.get("WN_FAULT", "")

    def kernel(x0_ref,                       # (1, Bt, E, R)  E = Tt + H
               c_ref,                        # (1, Bt, E, cin) or dummy
               gb_ref,                       # (L, Bt, G) f32 or (1,1,1)
               dsk_ref,                      # (1, Bt, E, S) f32 (zero pad)
               hm_ref,                       # (1, 1, E, 1) f32 home mask
               seed_ref,                     # (1, 2) int32 (SMEM): seed, boff
               bnd_ref,                      # (1, L, Bt, pad, R) dtype
               xsf_ref,                      # (L, Bt, Tt, R) home x_l | dummy
               xsh_ref,                      # (1, L, Bt, Hp, R) halo | dummy
               w_in_ref, b_in_ref, w_cond_ref, w_og_ref, b_og_ref,
               dx0_ref,                      # out (1, Bt, Tt, R) f32
               dc_ref,                       # out (1, Bt, Tt, cin)|dummy f32
               dgb_ref,                      # out (L, Bt, G) f32 | dummy
               dw_in_ref, db_in_ref,         # out (L, k*R, G) f32, (L, G)
               dw_cond_ref,                  # out (L, cin, G) f32 | dummy
               dw_og_ref, db_og_ref,         # out (L, G2, R+S), (L, R+S)
               *scratch):                    # [xs] + [ta, sb] per flags
        if xs_hbm:
            xs_ref, act_refs = None, list(scratch)
        else:
            xs_ref, *act_refs = scratch     # xs: (L, Bt, E, R)
        bi = pl.program_id(0)
        ti = pl.program_id(1)

        @pl.when(jnp.logical_and(bi == 0, ti == 0))
        def _init():
            dw_in_ref[...] = jnp.zeros_like(dw_in_ref)
            db_in_ref[...] = jnp.zeros_like(db_in_ref)
            dw_cond_ref[...] = jnp.zeros_like(dw_cond_ref)
            dw_og_ref[...] = jnp.zeros_like(dw_og_ref)
            db_og_ref[...] = jnp.zeros_like(db_og_ref)

        if has_g:
            # dgb blocks are per-bi (grid iterates ti fastest)
            @pl.when(ti == 0)
            def _init_gb():
                dgb_ref[...] = jnp.zeros_like(dgb_ref)

        ct = None
        ct_m = None
        hm = hm_ref[0, 0]                    # (E, 1)
        if has_c:
            ct = c_ref[0].astype(dtype).reshape(Bt * E, cin)
            ct_m = (c_ref[0].astype(jnp.float32) * hm).astype(dtype) \
                .reshape(Bt * E, cin)

        if has_drop:
            seed = seed_ref[0, 0]
            # seed_ref[0, 1] = global row offset of this shard (shard_map)
            b0 = bi * Bt + seed_ref[0, 1]
            t0k = ti * Tt - pad + H          # key of xp position 0
            if fault == "bwd_mask_tshift":
                t0k = t0k + 1                # DELIBERATE fwd/bwd mismatch

        def make_xp(xf, l):
            """Conv input (Bt, pad+E, R) dtype = [bnd_l | xf] with the
            forward's dropout applied; also returns the (pad+E) mask.
            Under dropout, xf is rounded to the compute dtype BEFORE the
            mask scale, mirroring the forward exactly (forward's note)."""
            bnd_l = bnd_ref[0, l].astype(jnp.float32)
            if fault == "bwd_bnd_roll":
                bnd_l = jnp.roll(bnd_l, 1, axis=1)  # DELIBERATE off-by-one
            xf_rt = (xf.astype(dtype).astype(jnp.float32)
                     if has_drop else xf)
            xp = jnp.concatenate([bnd_l, xf_rt], axis=1)
            if has_drop:
                m = dropout_mask(seed, Bt=Bt, E=pad + E, R=R, L=L, l=l,
                                 b0=b0, t0=t0k, keep=keep)
                return (xp * (m * (1.0 / keep))).astype(dtype), m
            return xp.astype(dtype), None

        def in_proj(xpd, l):
            """z (Bt*E, G) from the prebuilt (dropped) conv input."""
            w_l = w_in_ref[l]
            bias = jnp.zeros((Bt, 1, G), jnp.float32) + b_in_ref[l]
            if has_g:
                bias = bias + gb_ref[l][:, None, :]
            z = (jnp.zeros((Bt, E, G), jnp.float32)
                 + bias).reshape(Bt * E, G)
            for j in range(k):
                off = pad - (k - 1 - j) * dils[l]
                tap = xpd[:, off:off + E].reshape(Bt * E, R)
                z = z + jnp.dot(tap, w_l[j * R:(j + 1) * R],
                                preferred_element_type=jnp.float32)
            if has_c:
                z = z + jnp.dot(ct, w_cond_ref[l],
                                preferred_element_type=jnp.float32)
            return z

        # phase 1: reconstruct and stash x_l AND the gate activations
        # (tanh a, sigmoid b) for all layers — phase 2 then needs no
        # in_proj recompute at all (k+1 matmuls per layer saved). Only the
        # residual half of the (out|skip) projection feeds x_{l+1} — the
        # skip half is discarded here, so project against w_og[:, :R] alone.
        # The stash makes every position of the window exact (tile 0's
        # boundary columns are true zeros — the forward's carry reset).
        # With xs_hbm the whole phase DISAPPEARS: x_l arrives from the
        # forward's HBM stash (home tile + halo head), bit-exact.
        if not xs_hbm:
            x = x0_ref[0].astype(jnp.float32)
            for l in range(L):
                xs_ref[l] = x.astype(xs_ref.dtype)
                xpd, _ = make_xp(x, l)
                z = in_proj(xpd, l)
                a, b = z[:, :G2], z[:, G2:]
                ta, sb = jnp.tanh(a), jax.nn.sigmoid(b)
                if act_stash:
                    ta_ref, sb_ref = act_refs
                    ta_ref[l] = ta.reshape(Bt, E, G2).astype(ta_ref.dtype)
                    sb_ref[l] = sb.reshape(Bt, E, G2).astype(sb_ref.dtype)
                gated = (ta * sb).astype(dtype)
                y = jnp.dot(gated, w_og_ref[l][:, :R],
                            preferred_element_type=jnp.float32)
                x = ((y + b_og_ref[l][:R]).reshape(Bt, E, R)
                     + x) * _SQRT_HALF

        # phase 2: top-down grads
        dskips = dsk_ref[0].reshape(Bt * E, S)          # (Bt*E, S) f32
        dx = jnp.zeros((Bt, E, R), jnp.float32)         # d x_{l+1}
        dc_acc = (jnp.zeros((Bt * E, cin), jnp.float32) if has_c else None)
        for l in range(L - 1, -1, -1):
            if xs_hbm:
                xl = jnp.concatenate(
                    [xsf_ref[l].astype(jnp.float32),
                     xsh_ref[0, l][:, :E - Tt].astype(jnp.float32)],
                    axis=1)                             # (Bt, E, R)
            else:
                xl = xs_ref[l].astype(jnp.float32)      # (Bt, E, R)
            xpd, m_l = make_xp(xl, l)
            if act_stash:
                ta_ref, sb_ref = act_refs
                ta = ta_ref[l].astype(jnp.float32).reshape(Bt * E, G2)
                sb = sb_ref[l].astype(jnp.float32).reshape(Bt * E, G2)
            else:
                z = in_proj(xpd, l)
                a, b = z[:, :G2], z[:, G2:]
                ta, sb = jnp.tanh(a), jax.nn.sigmoid(b)
            gated = (ta * sb).astype(dtype)

            dy_out = dx * _SQRT_HALF                    # (Bt, E, R)
            # dgated from out (all positions) and skip (all positions; the
            # dskips tile is the true neighbor-extended gradient)
            dy = jnp.concatenate(
                [dy_out.reshape(Bt * E, R), dskips], axis=-1)  # (.., R+S)
            dgated = jnp.dot(dy.astype(dtype), w_og_ref[l].T,
                             preferred_element_type=jnp.float32)
            da = dgated * sb * (1.0 - ta * ta)
            db = dgated * ta * sb * (1.0 - sb)
            dz = jnp.concatenate([da, db], axis=-1)     # (Bt*E, G) f32

            # --- parameter grads: home-masked dz so boundary-spanning
            # positions accumulate in exactly one tile
            dz_m = (dz.reshape(Bt, E, G) * hm).reshape(Bt * E, G)
            dz_md = dz_m.astype(dtype)
            for j in range(k):
                off = pad - (k - 1 - j) * dils[l]
                tap = xpd[:, off:off + E].reshape(Bt * E, R)
                dw_in_ref[l, j * R:(j + 1) * R] += jnp.dot(
                    tap.T, dz_md, preferred_element_type=jnp.float32)
            db_in_ref[l] += jnp.sum(dz_m, axis=0)
            if has_g:
                dgb_ref[l] += jnp.sum(dz_m.reshape(Bt, E, G), axis=1)
            if has_c:
                dw_cond_ref[l] += jnp.dot(ct_m.T, dz_md,
                                          preferred_element_type=jnp.float32)
                dc_acc = dc_acc + jnp.dot(dz_md, w_cond_ref[l].T,
                                          preferred_element_type=jnp.float32)
            gm = (gated.astype(jnp.float32).reshape(Bt, E, G2)
                  * hm).astype(dtype).reshape(Bt * E, G2)
            dy_m = (dy.astype(jnp.float32).reshape(Bt, E, R + S)
                    * hm).astype(dtype).reshape(Bt * E, R + S)
            dw_og_ref[l] += jnp.dot(gm.T, dy_m,
                                    preferred_element_type=jnp.float32)
            db_og_ref[l] += jnp.sum(
                dy_m.astype(jnp.float32), axis=0)

            # --- dx_l: residual passthrough + transposed dilated conv.
            # dxin[t] += dz[t + (k-1-j)*d] @ Wj^T  (right-shifted reads;
            # zero-pad dz on the right)
            w_l = w_in_ref[l]
            dz3 = dz.reshape(Bt, E, G)
            dzp = jnp.concatenate(
                [dz3.astype(dtype), jnp.zeros((Bt, pad, G), dtype)], axis=1)
            dxin = jnp.zeros((Bt * E, R), jnp.float32)
            for j in range(k):
                sh = (k - 1 - j) * dils[l]
                dtap = dzp[:, sh:sh + E].reshape(Bt * E, G)
                dxin = dxin + jnp.dot(dtap, w_l[j * R:(j + 1) * R].T,
                                      preferred_element_type=jnp.float32)
            dxin3 = dxin.reshape(Bt, E, R)
            if m_l is not None:
                # the conv consumed x*m/keep: chain through the mask
                # (the window part of the pad+E mask)
                dxin3 = dxin3 * (m_l[:, pad:] * (1.0 / keep))
            dx = dy_out + dxin3

        dx0_ref[0] = dx[:, :Tt]
        if has_c:
            dc_ref[0] = dc_acc.reshape(Bt, E, cin)[:, :Tt]

    return kernel


@partial(jax.jit, static_argnames=("st",))
def _bwd_call(x0, c, gb, seed, w_in, b_in, w_cond, w_og, b_og, bnd,
              xsf, xsh, dskips, *, st):
    L, k, R, G, S = st.L, st.k, st.R, st.G, st.S
    cin, has_g, dils = st.cin, st.has_g, st.dils
    Bt, Tt = st.Bt_b, st.Tt_b
    dtype_name, interpret = st.dtype_name, st.interpret
    dtype = jnp.dtype(dtype_name)
    B, T, _ = x0.shape
    H = stack_receptive(dils, k)
    pad = max((k - 1) * d for d in dils)
    E = Tt + H
    T_pad = _round_up(T, Tt)
    n_tt = T_pad // Tt
    n_bt = B // Bt
    has_c = cin > 0
    # bnd was written at the FORWARD's tile boundaries; this kernel's tile
    # starts must land on them (fused_res_stack enforces Tt_b % Tt_f == 0)
    assert Tt % st.Tt_f == 0, (Tt, st.Tt_f)
    stride = Tt // st.Tt_f

    def tiles(a, left, right):
        a = jnp.pad(a, ((0, 0), (left, right + T_pad - T), (0, 0)))
        return jnp.stack([a[:, i * Tt:i * Tt + E] for i in range(n_tt)])

    # tile inputs ride in the kernel compute dtype (bf16 in production —
    # halves the double-buffered VMEM windows); grads stay f32
    x0e = tiles(x0.astype(dtype), 0, H)
    ce = (tiles(c.astype(dtype), 0, H) if has_c
          else jnp.zeros((1, 1, 1, 1), dtype))
    dske = tiles(dskips, 0, H)
    # home mask: positions [0, Tt) of the right-extended window
    hm = jnp.zeros((1, 1, E, 1), jnp.float32).at[:, :, :Tt].set(1.0)

    kernel = _make_bwd_kernel(L=L, k=k, R=R, G=G, S=S, cin=cin, has_g=has_g,
                              dils=dils, Bt=Bt, E=E, Tt=Tt, dtype=dtype,
                              drop=st.drop,
                              act_stash=st.act_stash, xs_hbm=st.xs_hbm)
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((1, 2), lambda bi, ti: (0, 0),
                             memory_space=pltpu.SMEM)
    bnd_spec = pl.BlockSpec((1, L, Bt, pad, R),
                            lambda bi, ti: (ti * stride, 0, bi, 0, 0),
                            memory_space=pltpu.VMEM)
    if st.xs_hbm:
        Hp = _round_up(H, 8)
        n_head = xsh.shape[0]
        xsf_spec = pl.BlockSpec((L, Bt, Tt, R),
                                lambda bi, ti: (0, bi, ti, 0),
                                memory_space=pltpu.VMEM)
        # the halo head is the FIRST Hp rows of the NEXT backward tile =
        # forward-tile index (ti+1)*stride; clamped at the end (the final
        # tile's halo pairs with zero cotangents, values irrelevant)
        xsh_spec = pl.BlockSpec(
            (1, L, Bt, Hp, R),
            lambda bi, ti: (jnp.minimum((ti + 1) * stride, n_head - 1),
                            0, bi, 0, 0),
            memory_space=pltpu.VMEM)
    else:
        xsf_spec = pl.BlockSpec((1, 1, 1, 1),
                                lambda bi, ti: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        xsh_spec = pl.BlockSpec((1, 1, 1, 1, 1),
                                lambda bi, ti: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)

    def tile_spec(C):
        return pl.BlockSpec((1, Bt, E, C), lambda bi, ti: (ti, bi, 0, 0),
                            memory_space=pltpu.VMEM)

    c_spec = (tile_spec(cin) if has_c else
              pl.BlockSpec((1, 1, 1, 1), lambda bi, ti: (0, 0, 0, 0),
                           memory_space=pltpu.VMEM))
    acc = lambda shape: pl.BlockSpec(
        shape, lambda bi, ti: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)

    kR = k * R
    G2 = G // 2
    cin_d = cin if has_c else 1
    gb_spec = (pl.BlockSpec((L, Bt, G), lambda bi, ti: (0, bi, 0),
                            memory_space=pltpu.VMEM)
               if has_g else
               pl.BlockSpec((1, 1, 1), lambda bi, ti: (0, 0, 0),
                            memory_space=pltpu.VMEM))
    out_shapes = (
        jax.ShapeDtypeStruct((n_tt, B, Tt, R), jnp.float32),   # dx0
        jax.ShapeDtypeStruct((n_tt, B, Tt, cin_d) if has_c
                             else (1, 1, 1, 1), jnp.float32),  # dc
        jax.ShapeDtypeStruct((L, B, G) if has_g
                             else (1, 1, 1), jnp.float32),     # dgb
        jax.ShapeDtypeStruct((L, kR, G), jnp.float32),
        jax.ShapeDtypeStruct((L, G), jnp.float32),
        jax.ShapeDtypeStruct((L, cin_d, G) if has_c
                             else (1, 1, 1), jnp.float32),
        jax.ShapeDtypeStruct((L, G2, R + S), jnp.float32),
        jax.ShapeDtypeStruct((L, R + S), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, Bt, Tt, R), lambda bi, ti: (ti, bi, 0, 0),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, Bt, Tt, cin_d), lambda bi, ti: (ti, bi, 0, 0),
                      memory_space=pltpu.VMEM) if has_c else
         acc((1, 1, 1, 1))),
        (pl.BlockSpec((L, Bt, G), lambda bi, ti: (0, bi, 0),
                      memory_space=pltpu.VMEM) if has_g else
         acc((1, 1, 1))),
        acc((L, kR, G)),
        acc((L, G)),
        acc((L, cin_d, G) if has_c else (1, 1, 1)),
        acc((L, G2, R + S)),
        acc((L, R + S)),
    )

    compiler_params = None
    if not interpret:
        # above the tile/stash gates; see the forward's note
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_COMPILE_LIMIT_BYTES)
    outs = pl.pallas_call(
        kernel,
        grid=(n_bt, n_tt),
        in_specs=[tile_spec(R), c_spec, gb_spec, tile_spec(S),
                  acc((1, 1, E, 1)), seed_spec, bnd_spec,
                  xsf_spec, xsh_spec,
                  full(), full(), full(), full(), full()],
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=(([] if st.xs_hbm
                         else [pltpu.VMEM((L, Bt, E, R), dtype)])
                        + ([pltpu.VMEM((L, Bt, E, G2), dtype),
                            pltpu.VMEM((L, Bt, E, G2), dtype)]
                           if st.act_stash else [])),
        interpret=interpret,
        compiler_params=compiler_params,
    )(x0e, ce, gb, dske, hm, seed, bnd, xsf, xsh,
      w_in, b_in, w_cond, w_og, b_og)

    dx0t, dct, dgb, dw_in, db_in, dw_cond, dw_og, db_og = outs
    dx0 = jnp.swapaxes(dx0t, 0, 1).reshape(B, T_pad, R)[:, :T]
    if has_c:
        dc = jnp.swapaxes(dct, 0, 1).reshape(B, T_pad, cin)[:, :T]
    else:
        dc = jnp.zeros_like(c)
    # db_og holds d(b_out|b_skip); the fwd consumed b_og as one vector
    return (dx0.astype(x0.dtype), dc.astype(c.dtype),
            (dgb if has_g else jnp.zeros_like(gb)),
            dw_in.astype(w_in.dtype), db_in.astype(b_in.dtype),
            (dw_cond.astype(w_cond.dtype) if has_c
             else jnp.zeros_like(w_cond)),
            dw_og.astype(w_og.dtype), db_og.astype(b_og.dtype))
