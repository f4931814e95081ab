"""Fused Pallas TPU kernel for autoregressive generation.

Why: the XLA `lax.scan` decoder (ops/generate.py) re-reads every conv weight
from HBM on every one of the T steps — for the flagship 24-layer model that is
~14.5MB x 22k steps ≈ 320GB of HBM traffic per generated second, an
HBM-bandwidth wall at ~45us/step. This kernel keeps ALL weights (bf16, ~7MB)
resident in VMEM for the entire generation, streams only the per-step
conditioning through the Pallas pipeline, and runs the whole sampling step
(first conv -> 24 gated residual blocks with dilated ring buffers -> head ->
mixture/categorical sampling) on-core.

Structure:
  * grid = (T / CHUNK,) over time chunks. TPU grid steps run sequentially, so
    VMEM scratch (ring buffers, current input) persists across chunks — the
    sequential AR dependency is preserved while the pipeline double-buffers
    the conditioning DMA.
  * ring buffers for all layers packed into one (sum_L, B, R) f32 scratch
    tile-aligned array (row = one (B, R) tile); per-layer offsets are static.
    Same read-before-write modular indexing as the scan decoder
    (see ops/generate.py docstring; reference: conv.py:34-44).
  * sampling uses the on-core PRNG (pltpu.prng_seed / prng_random_bits);
    NOTE: the random stream differs from the scan engine's jax.random stream —
    outputs are distribution-equivalent, not bit-identical. With
    deterministic=True both engines follow argmax/mean feedback and must
    agree numerically (the cross-engine equivalence test).

Reference behavior being replaced: wavenet.py:215-343 (incremental_forward),
conv.py:17-65 (incremental conv with linearized weights).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wavenet_vocoder_tpu.models.layers import conv_kernel
from wavenet_vocoder_tpu.models.wavenet import (
    WaveNetSpec,
    embed_global,
    make_generation_fast,
    upsample_conditioning,
)
from wavenet_vocoder_tpu.models.layers import conv1x1

Params = Dict[str, Any]

DEFAULT_CHUNK = 256


def _kernel_and_bias(p, dtype):
    w = conv_kernel(p).astype(dtype)
    b = p.get("b")
    return w, (None if b is None else b.astype(jnp.float32))


def pack_weights(params: Params, spec: WaveNetSpec, dtype=jnp.bfloat16,
                 variant: str = "fused") -> Dict[str, jnp.ndarray]:
    """Stack per-layer weights into kernel-friendly arrays.

    Shapes (L = layers, R = residual, G = gate, G2 = G//2, S = skip):
      w_first (C_in, R);  w_conv (L, k*R, G);  w_cond (L, cin, G) [opt];
      w_skip (L, G2, S);  w_out (L, G2, R);  w_h1 (S, S);  w_h2 (S, out).
    Biases are kept f32.

    variant="chain" packs the chain-split factorization instead of w_in/b_in
    (see _make_kernel): w_old (old taps + cond rows), w_new0, and the
    precomputed products w_hterm[l] = W_new[l+1]*sqrt(1/2),
    w_chain[l] = W_out[l] @ W_new[l+1] * sqrt(1/2) (f32 products, then cast),
    with b_pre[l] absorbing the residual-path bias b_out[l-1] @ W_new[l].
    """
    params = make_generation_fast(params)
    L = spec.layers
    out: Dict[str, jnp.ndarray] = {}

    w, b = _kernel_and_bias(params["first_conv"], dtype)
    out["w_first"] = w[0]                      # (C_in, R)
    out["b_first"] = b

    def stack(key_fn):
        return jnp.stack([key_fn(bp) for bp in params["blocks"]])

    k = spec.kernel_size
    r = spec.residual_channels

    # Fused input projection: one matmul per layer computes the dilated conv
    # AND the local-conditioning projection — rows [0, k*R) are the conv taps
    # (oldest..newest), rows [k*R, k*R+cin) the conditioning. Halves the
    # dependent-matmul chain vs separate conv/cond matmuls.
    def w_in_f32(bp):
        w = conv_kernel(bp["conv"]).astype(jnp.float32).reshape(k * r, -1)
        if spec.has_local_conditioning:
            wc = conv_kernel(bp["cond_c"]).astype(jnp.float32)[0]
            w = jnp.concatenate([w, wc], axis=0)
        return w

    if variant == "chain":
        sqrt_half = math.sqrt(0.5)
        wins = [w_in_f32(bp) for bp in params["blocks"]]
        w_new = [wi[(k - 1) * r:k * r] for wi in wins]        # (R, G) f32
        w_old = [jnp.concatenate([wi[:(k - 1) * r], wi[k * r:]], axis=0)
                 for wi in wins]                              # ((k-1)R+cin, G)
        w_out_l = [conv_kernel(bp["out"]).astype(jnp.float32)[0]
                   for bp in params["blocks"]]                # (G2, R)
        b_out_l = [bp["out"]["b"].astype(jnp.float32)
                   for bp in params["blocks"]]
        b_in_l = [bp["conv"]["b"].astype(jnp.float32)
                  for bp in params["blocks"]]
        out["w_old"] = jnp.stack(w_old).astype(dtype)
        out["w_new0"] = w_new[0].astype(dtype)
        b_pre = [b_in_l[0]]
        for li in range(1, L):
            b_pre.append(b_in_l[li]
                         + (b_out_l[li - 1] @ w_new[li]) * sqrt_half)
        out["b_pre"] = jnp.stack(b_pre)                       # (L, G) f32
        if L > 1:
            out["w_hterm"] = jnp.stack(
                [w_new[li + 1] * sqrt_half for li in range(L - 1)]
            ).astype(dtype)                                   # (L-1, R, G)
            out["w_chain"] = jnp.stack(
                [(w_out_l[li] @ w_new[li + 1]) * sqrt_half
                 for li in range(L - 1)]).astype(dtype)       # (L-1, G2, G)
        else:
            out["w_hterm"] = jnp.zeros((1, 1, 1), dtype)
            out["w_chain"] = jnp.zeros((1, 1, 1), dtype)
    else:
        out["w_in"] = stack(
            lambda bp: w_in_f32(bp).astype(dtype))             # (L, k*R[+cin], G)
        out["b_in"] = stack(lambda bp: bp["conv"]["b"].astype(jnp.float32))

    # Fused output projection: residual-out and skip-out share the gated
    # activation input — one (G2, R+S) matmul per layer.
    out["w_og"] = stack(lambda bp: jnp.concatenate([
        conv_kernel(bp["out"]).astype(dtype)[0],
        conv_kernel(bp["skip"]).astype(dtype)[0]], axis=-1))  # (L, G2, R+S)
    out["b_og"] = stack(lambda bp: jnp.concatenate([
        bp["out"]["b"], bp["skip"]["b"]]).astype(jnp.float32))

    w1, b1 = _kernel_and_bias(params["last_conv1"], dtype)
    w2, b2 = _kernel_and_bias(params["last_conv2"], dtype)
    out["w_h1"], out["b_h1"] = w1[0], b1
    out["w_h2"], out["b_h2"] = w2[0], b2
    return out


def buffer_layout(spec: WaveNetSpec) -> Tuple[Tuple[int, ...], int]:
    """Static (offsets, total_rows) of the packed ring buffer."""
    offs = []
    total = 0
    k = spec.kernel_size
    for d in spec.dilations:
        offs.append(total)
        total += (k - 1) * d
    return tuple(offs), total


def _uniform_from_bits(bits, lo=1e-5):
    """uint32 random bits -> f32 uniform in (lo, 1-lo).

    Mosaic has no uint32->f32 cast; the top 24 bits fit in int32, so bitcast
    to int32 first."""
    hi24 = pltpu.bitcast(bits >> 8, jnp.int32)
    u = hi24.astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.clip(u, lo, 1.0 - lo)


def _make_kernel(spec: WaveNetSpec, *, B: int, chunk: int, has_cond: bool,
                 has_gate: bool, log_scale_min: float, deterministic: bool,
                 variant: str = "fused", unroll: int = 1,
                 carry: bool = False):
    """Build the kernel body (closure over static structure).

    variant:
      "fused"      — one (B, k*R+cin) x (.., G) input matmul per layer
                     (concat of all taps + cond); 2 chained matmuls/layer.
      "split_taps" — per-tap matmuls, no concat (tested slower; kept as a
                     measured variant).
      "chain"      — chain-split algebra: old-tap/cond projections ("pre")
                     for ALL layers are computed up front (they only read
                     ring-buffer state from earlier steps, so they sit OFF the
                     sequential AR dependency chain and can fill the MXU while
                     the chain stalls); the residual projection of layer l is
                     folded into layer l+1's input projection via the
                     precomputed product W_out[l] @ W_new[l+1], so the chain
                     is ONE (B, G2) x (G2, G) matmul + GLU per layer:
                       z[l+1] = pre[l+1] + h[l] @ (W_new[l+1]*√½)   [off-chain]
                                + gated[l] @ (W_out[l] @ W_new[l+1] * √½)
                     Mathematically identical to "fused" (up to f32 rounding).
    """
    L = spec.layers
    k = spec.kernel_size
    R = spec.residual_channels
    G = spec.gate_channels
    G2 = G // 2
    S = spec.skip_out_channels
    C_out = spec.out_channels
    C_in = spec.in_channels
    cin = spec.cin_channels
    offs, total_rows = buffer_layout(spec)
    dils = spec.dilations
    sqrt_half = math.sqrt(0.5)
    sqrt_inv_L = math.sqrt(1.0 / L)
    scalar = spec.scalar_input
    distribution = spec.output_distribution
    chain = variant == "chain"
    split_taps = variant == "split_taps"
    # timing-knockout instrumentation (scripts/knockout_gen.py): disables
    # ONE op class to attribute step time inside the fused kernel (Pallas
    # ops are opaque to the profiler). Output is WRONG under any knockout —
    # never set GEN_KNOCKOUT in production. Read at kernel-BUILD time.
    import os as _os
    knockout = _os.environ.get("GEN_KNOCKOUT", "")
    # GLU cost knobs — the knockout ablation measured tanh+sigmoid at ~9us
    # of the ~51us step (B=256), the largest non-matmul component.
    # GEN_GLU_BF16=1: evaluate both in bf16 (sigmoid via tanh — Mosaic's
    #   bf16 logistic mis-lowers at B=1). MEASURED SLOWER on v5e (min-of-8
    #   1.165s vs 1.018s f32 at B=256): VPU transcendental rate is not
    #   dtype-halved and the extra tanh + casts cost more than they save.
    #   Kept as a knob; default off.
    # GEN_GLU_EXP=1 (default): one-divide algebra — tanh(a)*sigmoid(b) =
    #   (e^{2a}-1) / ((e^{2a}+1)(1+e^{-b})), fusing the two implicit
    #   divides into one (2 exp + 1 div + clamps vs 2 exp + 2 div).
    #   Applied only on the bf16 production pack; f32 packs keep the
    #   canonical f32 GLU for the cross-engine equivalence tests.
    glu_bf16 = bool(int(_os.environ.get("GEN_GLU_BF16", "0")))
    glu_exp = bool(int(_os.environ.get("GEN_GLU_EXP", "1")))

    def kernel(seed_ref,                      # SMEM (1,) or (2,): [seed, t0]
               x0_ref,                        # (B, C_in) initial/carried input
               cond_ref,                      # (chunk, B, cin) or (1, 1, 1)
               g_gate_ref,                    # (L, B, G) or (1, 1, 1) dummy
               w_first_ref, b_first_ref,
               *rest):
        if carry:
            # streaming/resume: ring + current-input come in as the buf0
            # input (x0_ref) and HBM-backed outputs that persist in VMEM
            # across grid steps (constant-index revisited blocks); the final
            # state flushes to HBM for the next segment.
            rest, tail = rest[:-4], rest[-4:]
            (buf0_ref, out_ref, buf_ref, x_cur_ref) = tail
        if chain:
            (w_old_ref, b_pre_ref,            # (L, (k-1)R[+cin], G), (L, G)
             w_new0_ref,                      # (R, G)
             w_hterm_ref, w_chain_ref,        # (L-1, R, G), (L-1, G2, G)
             w_og_ref, b_og_ref,
             w_h1_ref, b_h1_ref, w_h2_ref, b_h2_ref,
             *state_refs) = rest
        else:
            (w_in_ref, b_in_ref,              # (L, k*R[+cin], G), (L, G)
             w_og_ref, b_og_ref,              # (L, G2, R+S), (L, R+S)
             w_h1_ref, b_h1_ref, w_h2_ref, b_h2_ref,
             *state_refs) = rest
        if not carry:
            (out_ref,                         # (chunk, B) f32 or int32
             buf_ref,                         # scratch (total_rows, B, R)
             x_cur_ref) = state_refs          # scratch (B, C_in) f32
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _init():
            if carry:
                buf_ref[...] = buf0_ref[...]
                x_cur_ref[...] = x0_ref[...].astype(jnp.float32)
            else:
                buf_ref[...] = jnp.zeros_like(buf_ref)
                x_cur_ref[...] = x0_ref[...].astype(jnp.float32)

        t0 = seed_ref[1] if carry else 0
        if not deterministic:
            # absolute chunk index keys the stream: a resumed segment
            # continues the exact offline sampling sequence
            pltpu.prng_seed(seed_ref[0] + t0 // chunk + i)

        def step(j, _):
            t = t0 + i * chunk + j
            x_in = x_cur_ref[...]                       # (B, C_in) f32

            h = jnp.dot(x_in.astype(w_first_ref.dtype), w_first_ref[...],
                        preferred_element_type=jnp.float32) + b_first_ref[...]

            ct = None
            if has_cond:
                # knockout "cond_static": fixed row isolates the per-step
                # dynamic conditioning-slice cost
                ct = cond_ref[0] if knockout == "cond_static" \
                    else cond_ref[j]                    # (B, cin)

            skips = jnp.zeros((B, S), jnp.float32)
            if chain:
                wd = w_old_ref.dtype
                # Phase A (off the AR chain): every layer's old-tap + cond
                # projection reads only ring-buffer rows written at EARLIER
                # steps — independent of this step's h chain.
                pre = []
                for li in range(L):
                    d = dils[li]
                    Ll = (k - 1) * d
                    off = offs[li]
                    parts = []
                    for jj in range(k - 1, 0, -1):
                        row = off + (t - jj * d) % Ll
                        parts.append(buf_ref[pl.ds(row, 1)][0])
                    if has_cond:
                        parts.append(ct.astype(buf_ref.dtype))
                    inp = (parts[0] if len(parts) == 1
                           else jnp.concatenate(parts, axis=-1))
                    z_li = jnp.dot(inp.astype(wd), w_old_ref[li],
                                   preferred_element_type=jnp.float32)
                    z_li = z_li + b_pre_ref[li]
                    if has_gate:
                        z_li = z_li + g_gate_ref[li]
                    pre.append(z_li)

                # Phase B: the sequential chain — per layer ONE (B,G2)x(G2,G)
                # matmul + GLU; h / skips / hterm matmuls hang off the chain.
                z = pre[0] + jnp.dot(h.astype(wd), w_new0_ref[...],
                                     preferred_element_type=jnp.float32)
                for li in range(L):
                    off = offs[li]
                    Ll = (k - 1) * dils[li]
                    # write layer li's input (AFTER phase A read its rows)
                    buf_ref[pl.ds(off + t % Ll, 1)] = \
                        h[None].astype(buf_ref.dtype)
                    if li < L - 1:
                        hterm = jnp.dot(h.astype(wd), w_hterm_ref[li],
                                        preferred_element_type=jnp.float32)
                    a, b = z[:, :G2], z[:, G2:]
                    gated = jnp.tanh(a) * jax.nn.sigmoid(b)  # (B, G2) f32
                    y = jnp.dot(gated.astype(w_og_ref.dtype), w_og_ref[li],
                                preferred_element_type=jnp.float32)
                    y = y + b_og_ref[li]
                    skips = skips + y[:, R:]
                    h = (y[:, :R] + h) * sqrt_half
                    if li < L - 1:
                        z = pre[li + 1] + hterm + jnp.dot(
                            gated.astype(wd), w_chain_ref[li],
                            preferred_element_type=jnp.float32)
            else:
                for li in range(L):
                    d = dils[li]
                    Ll = (k - 1) * d
                    off = offs[li]
                    taps = []
                    for jj in range(k - 1, 0, -1):
                        # knockout "reads": static ring rows isolate the
                        # dynamic-address read cost
                        row = off if knockout == "reads" \
                            else off + (t - jj * d) % Ll
                        taps.append(buf_ref[pl.ds(row, 1)][0])   # (B, R) f32
                    # write current input AFTER reads (evicts x[t - Ll]).
                    # Buffer storage may be bf16: past taps only ever feed
                    # matmuls of that dtype, so narrowing loses nothing.
                    if knockout not in ("writes", "chainfree"):
                        buf_ref[pl.ds(off + t % Ll, 1)] = \
                            h[None].astype(buf_ref.dtype)
                    taps.append(h.astype(buf_ref.dtype))
                    if has_cond:
                        taps.append(ct.astype(buf_ref.dtype))

                    if split_taps:
                        # Sum of per-tap matmuls instead of concat+one-matmul:
                        # skips the (B, k*R+cin) concat copy, and only the
                        # newest tap's matmul sits on the sequential
                        # h-dependency chain — old-tap/cond matmuls of layer l
                        # can overlap the GLU/out of layer l-1.
                        wd = w_in_ref.dtype
                        z = b_in_ref[li]
                        for jj, tap in enumerate(taps):
                            z = z + jnp.dot(
                                tap.astype(wd),
                                w_in_ref[li, pl.ds(jj * R, R)] if jj < k
                                else w_in_ref[li, pl.ds(k * R, cin)],
                                preferred_element_type=jnp.float32)
                    else:
                        inp = jnp.concatenate(taps, axis=-1)  # (B, k*R[+cin])
                        z = jnp.dot(inp.astype(w_in_ref.dtype), w_in_ref[li],
                                    preferred_element_type=jnp.float32)
                        z = z + b_in_ref[li]
                    if has_gate:
                        z = z + g_gate_ref[li]
                    a, b = z[:, :G2], z[:, G2:]
                    # knockout "glu": one multiply instead of the two
                    # transcendentals — isolates VPU tanh/sigmoid cost
                    if knockout == "glu":
                        gated = a * 0.125
                    elif glu_bf16 and w_og_ref.dtype == jnp.bfloat16:
                        # sigmoid via tanh: Mosaic's bf16 `logistic`
                        # lowering emits a mistyped vector.broadcast at
                        # small batch (verified crash at B=1, r5); bf16
                        # tanh lowers cleanly at every batch
                        a16 = a.astype(jnp.bfloat16)
                        b16 = b.astype(jnp.bfloat16)
                        gated = jnp.tanh(a16) * (
                            0.5 * jnp.tanh(0.5 * b16) + 0.5)
                    elif glu_exp and w_og_ref.dtype == jnp.bfloat16:
                        # one-divide algebra (see knob comment); clamps
                        # keep exp finite — tanh/sigmoid saturate to 1 in
                        # f32 far below the clamp points
                        u = jnp.exp(2.0 * jnp.clip(a, -15.0, 15.0))
                        v = jnp.exp(jnp.clip(-b, -30.0, 30.0))
                        gated = (u - 1.0) / ((u + 1.0) * (1.0 + v))
                    else:
                        gated = jnp.tanh(a) * jax.nn.sigmoid(b)

                    y = jnp.dot(gated.astype(w_og_ref.dtype), w_og_ref[li],
                                preferred_element_type=jnp.float32)
                    y = y + b_og_ref[li]
                    skips = skips + y[:, R:]
                    h = (y[:, :R] + h) * sqrt_half

            skips = skips * sqrt_inv_L
            if knockout == "head" and S >= C_out:
                # skip the two head matmuls (isolates head cost)
                o = skips[:, :C_out]
            else:
                o = jnp.maximum(skips, 0.0)
                o = jnp.dot(o.astype(w_h1_ref.dtype), w_h1_ref[...],
                            preferred_element_type=jnp.float32) \
                    + b_h1_ref[...]
                o = jnp.maximum(o, 0.0)
                o = jnp.dot(o.astype(w_h2_ref.dtype), w_h2_ref[...],
                            preferred_element_type=jnp.float32) \
                    + b_h2_ref[...]
            # o: (B, C_out) f32

            if scalar:
                nr_mix = C_out // 3 if C_out > 2 else 1
                if C_out == 2:
                    mean, log_s = o[:, 0], o[:, 1]
                    if distribution == "Normal" and not deterministic:
                        bits = pltpu.prng_random_bits((B, 2))
                        u = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))
                        # Box-Muller
                        z0 = jnp.sqrt(-2.0 * jnp.log(u[:, 0])) \
                            * jnp.cos(2.0 * np.pi * u[:, 1])
                        sample = mean + jnp.exp(log_s) * z0
                    else:
                        sample = mean
                else:
                    logit = o[:, :nr_mix]
                    means = o[:, nr_mix:2 * nr_mix]
                    log_s = o[:, 2 * nr_mix:3 * nr_mix]
                    if deterministic:
                        sel = jnp.argmax(logit, axis=-1)
                    else:
                        bits = pltpu.prng_random_bits((B, nr_mix))
                        u = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))
                        sel = jnp.argmax(logit - jnp.log(-jnp.log(u)), axis=-1)
                    one_hot = (jax.lax.broadcasted_iota(
                        jnp.int32, (B, nr_mix), 1) == sel[:, None]
                    ).astype(jnp.float32)
                    mean = jnp.sum(means * one_hot, axis=-1)
                    ls = jnp.sum(log_s * one_hot, axis=-1)
                    if deterministic:
                        sample = mean
                    elif distribution == "Logistic":
                        bits2 = pltpu.prng_random_bits((B, 1))
                        u2 = _uniform_from_bits(
                            pltpu.bitcast(bits2, jnp.uint32))[:, 0]
                        sample = mean + jnp.exp(ls) * (jnp.log(u2)
                                                       - jnp.log(1.0 - u2))
                    else:  # Normal
                        bits2 = pltpu.prng_random_bits((B, 2))
                        u2 = _uniform_from_bits(
                            pltpu.bitcast(bits2, jnp.uint32))
                        z0 = jnp.sqrt(-2.0 * jnp.log(u2[:, 0])) \
                            * jnp.cos(2.0 * np.pi * u2[:, 1])
                        sample = mean + jnp.exp(ls) * z0
                sample = jnp.clip(sample, -1.0, 1.0)
                out_ref[j] = sample
                if knockout != "chainfree":  # break AR feedback for timing
                    x_cur_ref[...] = sample[:, None]
            else:
                if deterministic:
                    code = jnp.argmax(o, axis=-1)
                else:
                    bits = pltpu.prng_random_bits((B, C_out))
                    u = _uniform_from_bits(pltpu.bitcast(bits, jnp.uint32))
                    code = jnp.argmax(o - jnp.log(-jnp.log(u)), axis=-1)
                out_ref[j] = code.astype(jnp.int32)
                if knockout != "chainfree":
                    x_cur_ref[...] = (jax.lax.broadcasted_iota(
                        jnp.int32, (B, C_in), 1) == code[:, None]
                    ).astype(jnp.float32)
            return 0

        # unroll>1 trades instruction-memory for scheduling freedom: the
        # sampler/VPU tail of step t can overlap the ring-buffer reads and
        # off-chain matmuls of step t+1 (the AR data dependency only pins the
        # first-conv matmul).
        jax.lax.fori_loop(0, chunk, step, 0, unroll=unroll)

    return kernel, total_rows


@partial(jax.jit, static_argnames=("spec", "T", "chunk", "log_scale_min",
                                   "deterministic", "interpret",
                                   "vmem_limit_bytes", "variant", "unroll",
                                   "carry"))
def _pallas_generate_jit(packed: Dict[str, jnp.ndarray],
                         spec: WaveNetSpec, *, T: int,
                         c_up: Optional[jnp.ndarray],
                         g_gate: Optional[jnp.ndarray],
                         x0: jnp.ndarray,
                         seed: jnp.ndarray,
                         chunk: int,
                         log_scale_min: float,
                         deterministic: bool,
                         interpret: bool = False,
                         vmem_limit_bytes: Optional[int] = None,
                         variant: str = "fused",
                         unroll: int = 1,
                         carry: bool = False,
                         buf0: Optional[jnp.ndarray] = None,
                         ):
    """Returns (B, T) samples, or ((B, T), buf, x_cur) when ``carry`` —
    the ring/current-input state to resume the NEXT segment from (seed is
    then (2,): [base_seed, absolute_start_step])."""
    B = x0.shape[0]
    has_cond = c_up is not None
    has_gate = g_gate is not None
    n_chunks = T // chunk
    assert n_chunks * chunk == T

    kernel, total_rows = _make_kernel(
        spec, B=B, chunk=chunk, has_cond=has_cond, has_gate=has_gate,
        log_scale_min=log_scale_min, deterministic=deterministic,
        variant=variant, unroll=unroll, carry=carry)

    wref = packed["w_old"] if variant == "chain" else packed["w_in"]
    if has_cond:
        # conditioning stream in the weight dtype: bf16 halves the per-chunk
        # DMA and VMEM for the flagship path (it feeds a matmul of the same
        # dtype in the kernel); f32 weight packs keep f32 cond for the
        # equivalence tests
        cond_tm = jnp.swapaxes(c_up, 0, 1).astype(wref.dtype)
        cond_spec = pl.BlockSpec((chunk, B, cond_tm.shape[-1]),
                                 lambda i, seed: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        cond_tm = jnp.zeros((1, 1, 1), wref.dtype)
        cond_spec = pl.BlockSpec((1, 1, 1), lambda i, seed: (0, 0, 0),
                                 memory_space=pltpu.VMEM)

    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out_dtype = jnp.float32 if spec.scalar_input else jnp.int32

    if not has_gate:
        # no global conditioning: tiny dummy instead of an (L, B, G) zeros
        # buffer pinned in VMEM for the whole generation
        g_gate = jnp.zeros((1, 1, 1), jnp.float32)

    if variant == "chain":
        layer_weights = [packed["w_old"], packed["b_pre"], packed["w_new0"],
                         packed["w_hterm"], packed["w_chain"]]
    else:
        layer_weights = [packed["w_in"], packed["b_in"]]

    in_specs = [
        full(),                    # x0 (initial / carried current input)
        cond_spec,                 # cond chunk
        full(),                    # g_gate
        full(), full(),            # w_first, b_first
        *[full() for _ in layer_weights],  # per-variant layer weights
        full(), full(),            # w_og, b_og
        full(), full(), full(), full(),  # head
    ]
    operands = [x0, cond_tm, g_gate,
                packed["w_first"], packed["b_first"],
                *layer_weights,
                packed["w_og"], packed["b_og"],
                packed["w_h1"], packed["b_h1"],
                packed["w_h2"], packed["b_h2"]]
    samples_spec = pl.BlockSpec((chunk, B), lambda i, seed: (i, 0),
                                memory_space=pltpu.VMEM)
    buf_shape = (total_rows, B, spec.residual_channels)
    if carry:
        if buf0 is None:
            buf0 = jnp.zeros(buf_shape, wref.dtype)
        in_specs.append(full())
        operands.append(buf0.astype(wref.dtype))
        # state rides as constant-index output blocks: resident in VMEM for
        # the whole generation, flushed to HBM once at the end
        out_specs = (samples_spec,
                     pl.BlockSpec(buf_shape, lambda i, seed: (0, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((B, spec.in_channels),
                                  lambda i, seed: (0, 0),
                                  memory_space=pltpu.VMEM))
        out_shape = (jax.ShapeDtypeStruct((T, B), out_dtype),
                     jax.ShapeDtypeStruct(buf_shape, wref.dtype),
                     jax.ShapeDtypeStruct((B, spec.in_channels), jnp.float32))
        scratch_shapes = []
    else:
        out_specs = samples_spec
        out_shape = jax.ShapeDtypeStruct((T, B), out_dtype)
        scratch_shapes = [
            # ring buffers in the weight dtype (bf16 for production: taps are
            # matmul inputs of that dtype; halves buffer VMEM, enabling B=32)
            pltpu.VMEM(buf_shape, wref.dtype),
            pltpu.VMEM((B, spec.in_channels), jnp.float32),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch_shapes,
    )

    compiler_params = None
    if vmem_limit_bytes is not None and not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=int(vmem_limit_bytes))

    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
        compiler_params=compiler_params,
    )(seed, *operands)
    if carry:
        samples, buf, x_cur = out
        return jnp.swapaxes(samples, 0, 1), buf, x_cur
    return jnp.swapaxes(out, 0, 1)  # (B, T)


class PallasGenerator:
    """Pack-once, generate-many wrapper around the fused kernel.

    Weight-norm folding + weight packing cost dozens of host-dispatched ops;
    doing them per call dominates the kernel time (the kernel itself runs at
    ~9us/step for the flagship model). Construct once per model, call per
    batch — the production serving shape.

    Multi-chip: pass a ``mesh`` to shard utterances over its ``data_axis`` —
    each device runs its own fused kernel on its batch shard with ZERO
    inter-chip communication (SURVEY.md section 5.8; the reference's batched
    synthesis, synthesis.py:42-64, scaled only by launching more processes).
    Weights replicate; per-device PRNG streams are decorrelated by folding
    the axis index into the seed.
    """

    def __init__(self, params: Params, spec: WaveNetSpec, *,
                 weight_dtype=jnp.bfloat16, chunk: int = DEFAULT_CHUNK,
                 vmem_limit_bytes: Optional[int] = None,
                 split_taps: bool = False, variant: str = "fused",
                 unroll: int = 1, mesh=None, data_axis: str = "data"):
        if split_taps:
            variant = "split_taps"
        if unroll not in (1, chunk):
            # Mosaic lowers fori_loop only rolled or FULLY unrolled; fail
            # here instead of after a multi-minute TPU compile. (Full unroll
            # is compile-time-expensive — see CLAUDE.md perf notes.)
            raise ValueError(
                f"unroll must be 1 or chunk ({chunk}), got {unroll}")
        self.spec = spec
        self.chunk = chunk
        self.vmem_limit_bytes = vmem_limit_bytes
        self.variant = variant
        self.unroll = unroll
        self.mesh = mesh
        self.data_axis = data_axis
        self._shard_cache: Dict[Any, Any] = {}
        self.params = make_generation_fast(params)
        packed = pack_weights(self.params, spec, dtype=weight_dtype,
                              variant=variant)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            repl = NamedSharding(mesh, P())
            self.params = jax.device_put(self.params, repl)
            self.packed = jax.device_put(packed, repl)
        else:
            self.packed = jax.device_put(packed)

    def estimate_vmem_bytes(self, B: int) -> int:
        """Rough VMEM footprint: packed weights + ring buffers + double-
        buffered cond chunks + head/out — used to pick batch/chunk sizes.

        Every window's minor dim is LANE-padded to 128 and the
        second-minor to 8 sublanes — cin=80 costs 128 lanes per position
        (measured at B=512: the double-buffered cond window allocated
        64MB where unpadded math said 42MB, pushing the kernel 1.55MB
        past physical VMEM into a Mosaic compile error)."""
        spec, chunk = self.spec, self.chunk

        def lanes(n):
            return -(-n // 128) * 128

        def subl(n):
            return -(-n // 8) * 8

        wbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                     for a in jax.tree.leaves(self.packed))
        _, total_rows = buffer_layout(spec)
        wref = self.packed.get("w_in", self.packed.get("w_old"))
        itm = wref.dtype.itemsize
        ring = total_rows * subl(B) * lanes(spec.residual_channels) * itm
        cond = 0
        if spec.has_local_conditioning:
            cond = 2 * chunk * subl(B) * lanes(spec.cin_channels) * itm
        out = 2 * subl(chunk) * lanes(B) * 4
        return wbytes + ring + cond + out

    def __call__(self, rng, *, T: Optional[int] = None,
                 c: Optional[jnp.ndarray] = None,
                 g: Optional[jnp.ndarray] = None,
                 initial_input: Optional[jnp.ndarray] = None,
                 log_scale_min: float = -50.0,
                 deterministic: bool = False,
                 interpret: bool = False,
                 state: Optional[Dict[str, Any]] = None,
                 return_state: bool = False):
        """Generate (B, T) samples. ``state``/``return_state`` carry the
        decoder's ring-buffer state across calls (streaming segments):
        pass ``state=None, return_state=True`` for the first segment, feed
        each returned state into the next call. Segment boundaries must be
        multiples of ``chunk``; the sampled sequence is then bit-identical
        to one offline call with the same rng (the PRNG is keyed by the
        absolute chunk index)."""
        spec, chunk = self.spec, self.chunk
        params = self.params
        carry = return_state or state is not None

        if state is not None:
            B = state["x_cur"].shape[0]
        elif c is not None:
            B = c.shape[0]
        elif initial_input is not None:
            B = initial_input.shape[0]
        else:
            B = 1

        n_shards = 1
        if self.mesh is not None:
            from wavenet_vocoder_tpu.parallel.sharding import shard_batch
            n_shards = self.mesh.shape[self.data_axis]
            if B % n_shards != 0:
                raise ValueError(
                    f"batch {B} not divisible by mesh '{self.data_axis}' "
                    f"axis ({n_shards}); pad the utterance batch")
            if c is not None:
                c = shard_batch(jnp.asarray(c), self.mesh, self.data_axis)
            if g is not None:
                g = shard_batch(jnp.asarray(g), self.mesh, self.data_axis)

        c_up = upsample_conditioning(params, spec, c)
        if c_up is not None:
            if T is None:
                T = c_up.shape[1]
            assert c_up.shape[1] == T, (c_up.shape, T)
        if T is None:
            raise ValueError("T required without conditioning")

        # pad T to a chunk multiple; trim after
        T_pad = ((T + chunk - 1) // chunk) * chunk
        if c_up is not None and T_pad != T:
            pad = jnp.repeat(c_up[:, -1:], T_pad - T, axis=1)
            c_up = jnp.concatenate([c_up, pad], axis=1)

        g_vec = embed_global(params, spec, g)
        if g_vec is not None:
            g_gate = jnp.stack([
                conv1x1(bp["cond_g"], g_vec).astype(jnp.float32)
                for bp in params["blocks"]])              # (L, B, G)
        else:
            g_gate = None

        if state is not None:
            x0 = state["x_cur"]
        elif initial_input is None:
            if spec.scalar_input:
                x0 = jnp.zeros((B, 1), jnp.float32)
            else:
                x0 = jnp.zeros((B, spec.out_channels),
                               jnp.float32).at[:, 127].set(1.0)
        else:
            x0 = initial_input.reshape(B, -1).astype(jnp.float32)

        base_seed = jax.random.randint(rng, (), 0, 2 ** 31 - 1).astype(
            jnp.int32)
        if carry:
            if self.mesh is not None:
                raise ValueError("streaming state carry is single-device; "
                                 "run one stream group per device instead")
            t_abs = int(state["t"]) if state is not None else 0
            if T % chunk != 0 or t_abs % chunk != 0:
                raise ValueError(
                    f"streaming segments must be multiples of the kernel "
                    f"chunk ({chunk}); got T={T} at t={t_abs}. Pick a chunk "
                    "dividing the emit block (e.g. chunk=hop_size)")
            seed = jnp.stack([base_seed,
                              jnp.asarray(t_abs, jnp.int32)])
        else:
            seed = base_seed[None]

        # VMEM budgeting. Mosaic's default scoped-VMEM limit is far below the
        # physical VMEM (v5e: 128MiB); auto-raise it when the footprint
        # estimate says the batch needs more, so B=64..256 works out of the
        # box. When even that is not enough (long/wide configs: the 30L/3S
        # published model has a 6139-sample receptive field = 12x the
        # flagship's ring rows; 512-channel configs carry 4x the weights),
        # AUTO-SPLIT the batch into sub-batches whose resident state fits and
        # run the fused kernel per group — utterances are independent AR
        # chains, so this is exact. Under a mesh each device holds only its
        # batch shard; splitting applies to the per-device batch.
        budget = (self.vmem_limit_bytes if self.vmem_limit_bytes is not None
                  else 120 * 2 ** 20)
        B_local = B // n_shards
        sub = B_local
        while sub > 8 and self.estimate_vmem_bytes(sub) > budget:
            sub = max(8, -(-sub // 2))
            sub += (-sub) % 8  # keep sublane-friendly multiples of 8
        est = self.estimate_vmem_bytes(sub)
        if est > budget and not interpret:
            raise ValueError(
                f"fused-kernel state ≈{est / 2**20:.0f} MiB exceeds physical "
                f"VMEM even at batch {sub} (chunk={self.chunk}, receptive "
                f"field {spec.receptive_field}); lower the chunk or use the "
                "scan engine for this config")
        vmem_limit = self.vmem_limit_bytes
        if vmem_limit is None and est > 24 * 2 ** 20:
            vmem_limit = min(120 * 2 ** 20, int(est * 1.5) + 8 * 2 ** 20)

        kernel_kwargs = dict(
            chunk=chunk, log_scale_min=float(log_scale_min),
            deterministic=deterministic, interpret=interpret,
            vmem_limit_bytes=vmem_limit, variant=self.variant,
            unroll=self.unroll)

        if carry:
            # streaming segment: carry the ring state in and out (split is
            # not applied — streams are small-batch latency workloads)
            samples, buf, x_cur = _pallas_generate_jit(
                self.packed, spec, T=int(T_pad), c_up=c_up, g_gate=g_gate,
                x0=x0, seed=seed, carry=True,
                buf0=None if state is None else state["buf"],
                **kernel_kwargs)
            if not return_state:
                return samples[:, :T]
            new_state = {"buf": buf, "x_cur": x_cur, "t": t_abs + int(T)}
            return samples[:, :T], new_state

        def run(c_up_g, g_gate_g, x0_g, seed_g):
            if self.mesh is None:
                return _pallas_generate_jit(
                    self.packed, spec, T=int(T_pad), c_up=c_up_g,
                    g_gate=g_gate_g, x0=x0_g, seed=seed_g, **kernel_kwargs)
            return self._dispatch_sharded(c_up_g, g_gate_g, x0_g, seed_g,
                                          int(T_pad), kernel_kwargs)

        if sub == B_local:
            return run(c_up, g_gate, x0, seed)[:, :T]

        # batch split: pad to a group multiple (replicated rows are dropped),
        # one kernel compile reused across all groups
        group = sub * n_shards
        n_groups = -(-B // group)
        pad_rows = n_groups * group - B

        def pad_b(a, axis):
            if a is None or pad_rows == 0:
                return a
            reps = jnp.repeat(jnp.take(a, jnp.asarray([0]), axis=axis),
                              pad_rows, axis=axis)
            return jnp.concatenate([a, reps], axis=axis)

        x0 = pad_b(x0, 0)
        c_up = pad_b(c_up, 0)
        g_gate = pad_b(g_gate, 1)
        outs = []
        for gi in range(n_groups):
            s0 = gi * group
            outs.append(run(
                None if c_up is None else c_up[s0:s0 + group],
                None if g_gate is None else g_gate[:, s0:s0 + group],
                x0[s0:s0 + group],
                seed + gi * 7919))  # distinct PRNG stream per group
        out = jnp.concatenate(outs, axis=0)[:B]
        return out[:, :T]

    def _dispatch_sharded(self, c_up, g_gate, x0, seed, T_pad: int,
                          kernel_kwargs) -> jnp.ndarray:
        """shard_map the fused kernel over the mesh's data axis: one
        independent per-device kernel per utterance shard, no collectives.
        Per-device PRNG streams are seed + axis_index.

        The jitted shard_map wrapper is CACHED per call signature — a fresh
        closure every call would retrace the whole kernel graph per request
        (measured ~25% throughput loss on the B=256 flagship bench)."""
        from jax.sharding import PartitionSpec as P
        mesh, axis, spec = self.mesh, self.data_axis, self.spec
        has_c = c_up is not None
        has_g = g_gate is not None
        key = (has_c, has_g, T_pad, x0.shape[0],
               tuple(sorted(kernel_kwargs.items())))
        fn = self._shard_cache.get(key)
        if fn is None:
            def body(packed, x0_l, seed_l, *rest):
                c_l = rest[0] if has_c else None
                g_l = rest[1 if has_c else 0] if has_g else None
                seed_l = seed_l + jax.lax.axis_index(axis).astype(
                    seed_l.dtype)
                return _pallas_generate_jit(
                    packed, spec, T=T_pad, c_up=c_l, g_gate=g_l,
                    x0=x0_l, seed=seed_l, **kernel_kwargs)

            in_specs = [P(), P(axis), P()]
            if has_c:
                in_specs.append(P(axis))
            if has_g:
                in_specs.append(P(None, axis))
            fn = jax.jit(jax.shard_map(
                body, mesh=mesh, in_specs=tuple(in_specs),
                out_specs=P(axis), check_vma=False))
            self._shard_cache[key] = fn
        args = [self.packed, x0, seed]
        if has_c:
            args.append(c_up)
        if has_g:
            args.append(g_gate)
        return fn(*args)


def generate_pallas(params: Params, spec: WaveNetSpec, rng, *,
                    T: Optional[int] = None,
                    c: Optional[jnp.ndarray] = None,
                    g: Optional[jnp.ndarray] = None,
                    initial_input: Optional[jnp.ndarray] = None,
                    log_scale_min: float = -50.0,
                    weight_dtype=jnp.bfloat16,
                    chunk: int = DEFAULT_CHUNK,
                    deterministic: bool = False,
                    interpret: bool = False,
                    variant: str = "fused",
                    unroll: int = 1,
                    mesh=None, data_axis: str = "data") -> jnp.ndarray:
    """One-shot fused-kernel generation (packs weights per call — prefer
    :class:`PallasGenerator` for repeated use).

    Returns (B, T) f32 samples for scalar heads, or (B, T) int32 mu-law codes
    for the categorical head (the scan engine returns one-hot; codes decode
    directly via inv_mulaw_quantize). With a ``mesh``, utterances shard over
    its ``data_axis`` (one independent kernel per device).
    """
    gen = PallasGenerator(params, spec, weight_dtype=weight_dtype, chunk=chunk,
                          variant=variant, unroll=unroll, mesh=mesh,
                          data_axis=data_axis)
    return gen(rng, T=T, c=c, g=g, initial_input=initial_input,
               log_scale_min=log_scale_min, deterministic=deterministic,
               interpret=interpret)
