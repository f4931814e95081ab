"""Autoregressive generation as ONE jitted ``lax.scan``.

This replaces the reference's Python sample loop — ~125 host-dispatched tiny
GEMVs per generated sample (reference: wavenet.py:296-336, conv.py:17-46) —
with a single compiled scan whose carry holds every layer's dilated-conv ring
buffer. XLA keeps the whole step (24 fused matmul+GLU blocks + head sampling)
on-chip; weights are read from HBM once per step with no host round-trips.

Ring-buffer scheme (per residual block, kernel k, dilation d):
  buffer length L = (k-1)*d holds the last L inputs of that layer,
  slot i mod L <- x_i. At step t the dilated taps x[t-j*d] (j=1..k-1) live at
  slots (t-j*d) mod L; reads happen before the write of x_t to slot t mod L
  (which evicts exactly x[t-L], the oldest needed-no-more sample). Unwritten
  slots are zero — identical to the reference's causal left-padding.
  This is the Fast-WaveNet queue (arXiv:1611.09482) expressed as pure
  functional state (reference mutates per-module Python buffers,
  conv.py:34-44).

RNG: one base key, ``fold_in(key, t)`` per step — deterministic, replayable,
and parallel-safe (reference uses global torch RNG state,
wavenet.py:334, mixture.py:138-151).
"""
from __future__ import annotations

import math
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from wavenet_vocoder_tpu.models.layers import conv1x1, conv_step
from wavenet_vocoder_tpu.models.wavenet import (
    WaveNetSpec,
    embed_global,
    make_generation_fast,
    upsample_conditioning,
)
from wavenet_vocoder_tpu.ops.mixture import (
    sample_from_discretized_mix_logistic,
    sample_from_mix_gaussian,
)

Params = Dict[str, Any]


def init_buffers(spec: WaveNetSpec, batch: int,
                 dtype=jnp.float32) -> Tuple[jnp.ndarray, ...]:
    """Zeroed ring buffers, one per residual block: (B, (k-1)*d, R)."""
    k, r = spec.kernel_size, spec.residual_channels
    return tuple(
        jnp.zeros((batch, (k - 1) * d, r), dtype=dtype)
        for d in spec.dilations
    )


def default_initial_input(spec: WaveNetSpec, batch: int,
                          dtype=jnp.float32) -> jnp.ndarray:
    """Zero scalar, or mu-law one-hot at code 127 (reference: wavenet.py:281-289)."""
    if spec.scalar_input:
        return jnp.zeros((batch, 1), dtype=dtype)
    x0 = jnp.zeros((batch, spec.out_channels), dtype=dtype)
    return x0.at[:, 127].set(1.0)


def _sample_next(spec: WaveNetSpec, key, out: jnp.ndarray, *,
                 log_scale_min: float, softmax: bool, quantize: bool,
                 deterministic: bool = False):
    """Head output (B, C) f32 -> (next_input (B, C_in), emitted (B, C_emit)).

    Scalar heads emit the sampled scalar; the categorical head emits the
    sampled one-hot (or the softmax distribution when quantize=False)
    (reference: wavenet.py:322-335).

    deterministic=True replaces sampling with argmax/mode feedback (mixture:
    argmax-component mean; categorical: argmax code) — used for cross-engine
    equivalence tests against the Pallas kernel.
    """
    if deterministic:
        if spec.scalar_input:
            if out.shape[-1] == 2:
                s = jnp.clip(out[:, 0], -1.0, 1.0)[:, None]
                return s, s
            nr_mix = out.shape[-1] // 3
            sel = jnp.argmax(out[..., :nr_mix], axis=-1)
            one_hot = jax.nn.one_hot(sel, nr_mix, dtype=jnp.float32)
            mean = jnp.sum(out[..., nr_mix:2 * nr_mix] * one_hot, axis=-1)
            s = jnp.clip(mean, -1.0, 1.0)[:, None]
            return s, s
        idx = jnp.argmax(out, axis=-1)
        one_hot = jax.nn.one_hot(idx, spec.out_channels, dtype=out.dtype)
        return one_hot, one_hot
    if spec.scalar_input:
        if spec.output_distribution == "Logistic":
            s = sample_from_discretized_mix_logistic(
                key, out, log_scale_min=log_scale_min)
        elif spec.output_distribution == "Normal":
            s = sample_from_mix_gaussian(key, out, log_scale_min=log_scale_min)
        else:
            raise ValueError(spec.output_distribution)
        s = s[:, None]  # (B, 1)
        return s, s
    if quantize:
        # softmax=True: out is logits -> categorical(out) samples softmax(out)
        # softmax=False: out is already probabilities -> sample via log-probs
        logits = out if softmax else jnp.log(jnp.maximum(out, 1e-12))
        idx = jax.random.categorical(key, logits, axis=-1)
        one_hot = jax.nn.one_hot(idx, spec.out_channels, dtype=out.dtype)
        return one_hot, one_hot
    probs = jax.nn.softmax(out, axis=-1) if softmax else out
    return probs, probs


@partial(jax.jit, static_argnames=(
    "spec", "T", "softmax", "quantize", "output", "log_scale_min",
    "deterministic", "dtype", "return_state"))
def _generate_scan(params: Params, spec: WaveNetSpec, rng, *, T: int,
                   c_up: Optional[jnp.ndarray],
                   g_vec: Optional[jnp.ndarray],
                   initial_input: jnp.ndarray,
                   test_inputs: Optional[jnp.ndarray],
                   n_test: Optional[jnp.ndarray],
                   softmax: bool, quantize: bool,
                   log_scale_min: float, output: str,
                   deterministic: bool = False,
                   dtype=None,
                   t0: Optional[jnp.ndarray] = None,
                   buffers0: Optional[Tuple[jnp.ndarray, ...]] = None,
                   return_state: bool = False):
    """The compiled scan. All conditioning pre-sliced to time-major xs.

    dtype: compute dtype for the per-step network (e.g. jnp.bfloat16 halves
    the per-step HBM weight streaming — the scan engine's bottleneck); head
    outputs and sampling stay f32.

    Streaming: ``t0``/``buffers0`` resume a previous call's final carry (the
    ring indices and the per-step RNG both key off the ABSOLUTE step index
    t0+i, so a chunked run is bit-identical to one long scan);
    ``return_state=True`` additionally returns the final carry.
    """
    B = initial_input.shape[0]
    if dtype is not None:
        cast = lambda a: (a.astype(dtype)
                          if jnp.issubdtype(a.dtype, jnp.floating) else a)
        params = jax.tree.map(cast, params)
        initial_input = initial_input.astype(dtype)
        if c_up is not None:
            c_up = c_up.astype(dtype)
        if g_vec is not None:
            g_vec = g_vec.astype(dtype)
        if test_inputs is not None:
            test_inputs = test_inputs.astype(dtype)
    k = spec.kernel_size
    sqrt_inv_layers = math.sqrt(1.0 / spec.layers)

    # Time-invariant global-conditioning projections, computed ONCE
    # (the reference re-projects g every step, modules.py:148-152).
    g_gate = None
    if g_vec is not None:
        g_gate = [conv1x1(bp["cond_g"], g_vec) for bp in params["blocks"]]

    ts = jnp.arange(T, dtype=jnp.int32)
    if t0 is not None:
        ts = ts + t0.astype(jnp.int32)
    xs: Dict[str, jnp.ndarray] = {"t": ts}
    if c_up is not None:
        xs["c"] = jnp.swapaxes(c_up, 0, 1)  # (T, B, C)
    if test_inputs is not None:
        xs["test"] = jnp.swapaxes(test_inputs, 0, 1)  # (T, B, C_in)

    def step(carry, x_t):
        x_in, buffers = carry
        t = x_t["t"]
        if test_inputs is not None:
            use_test = t < n_test
            x_in = jnp.where(use_test, x_t["test"], x_in)

        ct = x_t.get("c")  # (B, cin) or None

        x = conv1x1(params["first_conv"], x_in)  # (B, R)

        skips = jnp.zeros((B, spec.skip_out_channels), dtype=x.dtype)
        new_buffers = []
        for li, (bp, d) in enumerate(zip(params["blocks"], spec.dilations)):
            buf = buffers[li]              # (B, L, R), L = (k-1)*d
            L = (k - 1) * d
            residual = x
            # Gather dilated taps oldest..newest; taps[:, -1] = current input.
            taps = [
                jax.lax.dynamic_slice(
                    buf, (0, (t - j * d) % L, 0), (B, 1, buf.shape[2]))[:, 0, :]
                for j in range(k - 1, 0, -1)
            ] + [x]
            taps = jnp.stack(taps, axis=1)  # (B, k, R)
            # Write current input (evicts x[t-L]) AFTER the reads above.
            new_buffers.append(jax.lax.dynamic_update_slice(
                buf, x[:, None, :], (0, t % L, 0)))

            h = conv_step(bp["conv"], taps)  # (B, gate)
            a, b = jnp.split(h, 2, axis=-1)
            if ct is not None:
                ca, cb = jnp.split(conv1x1(bp["cond_c"], ct), 2, axis=-1)
                a, b = a + ca, b + cb
            if g_gate is not None:
                ga, gb = jnp.split(g_gate[li], 2, axis=-1)
                a, b = a + ga, b + gb
            h = jnp.tanh(a) * jax.nn.sigmoid(b)

            skips = skips + conv1x1(bp["skip"], h)
            x = (conv1x1(bp["out"], h) + residual) * math.sqrt(0.5)

        skips = skips * sqrt_inv_layers
        out = jax.nn.relu(skips)
        out = conv1x1(params["last_conv1"], out)
        out = jax.nn.relu(out)
        out = conv1x1(params["last_conv2"], out).astype(jnp.float32)

        key_t = jax.random.fold_in(rng, t)
        next_in, emitted = _sample_next(
            spec, key_t, out, log_scale_min=log_scale_min,
            softmax=softmax, quantize=quantize, deterministic=deterministic)

        ys = {}
        if output in ("samples", "both"):
            ys["samples"] = emitted
        if output in ("logits", "both"):
            ys["logits"] = out
        return (next_in.astype(x_in.dtype), tuple(new_buffers)), ys

    if buffers0 is None:
        buffers0 = init_buffers(spec, B, dtype=initial_input.dtype)
    else:
        buffers0 = tuple(b.astype(initial_input.dtype) for b in buffers0)
    carry, ys = jax.lax.scan(step, (initial_input, buffers0), xs)
    # time-major -> batch-major
    out = {k_: jnp.swapaxes(v, 0, 1) for k_, v in ys.items()}
    if return_state:
        x_last, buffers_last = carry
        out["state"] = (x_last.astype(jnp.float32),
                        tuple(b.astype(jnp.float32) for b in buffers_last))
    return out


def generate(params: Params, spec: WaveNetSpec, rng, *,
             T: Optional[int] = None,
             c: Optional[jnp.ndarray] = None,
             g: Optional[jnp.ndarray] = None,
             initial_input: Optional[jnp.ndarray] = None,
             test_inputs: Optional[jnp.ndarray] = None,
             softmax: bool = True, quantize: bool = True,
             log_scale_min: float = -50.0,
             output: str = "samples",
             fold_weight_norm: bool = True,
             deterministic: bool = False,
             dtype=None,
             state: Optional[Tuple] = None,
             return_state: bool = False) -> Dict[str, jnp.ndarray]:
    """Autoregressive generation (reference: wavenet.py:215-343).

    Args:
      params, spec: the model.
      rng: base PRNG key for all sampling.
      T: number of samples to generate; inferred from c/test_inputs if None.
      c: local conditioning — (B, T_mel, C) with an upsample net, else (B, T, C).
      g: global conditioning ids/floats.
      initial_input: (B, C_in) first input; default zero scalar / one-hot 127.
      test_inputs: (B, T_test, C_in) teacher-forcing inputs — the model sees
        test_inputs[:, t] at step t while t < T_test
        (reference: wavenet.py:297-301).
      softmax/quantize: categorical-head behavior (reference: wavenet.py:332-335).
      output: "samples" | "logits" | "both".
      state: (x_in, buffers, t_offset) from a previous call's returned state —
        resumes generation mid-stream (chunked calls are bit-identical to one
        long call; see streaming.StreamingSynthesizer).
      return_state: include the final ("x_in", buffers, t_offset+T) carry
        under key "state".

    Returns dict with:
      samples: (B, T, 1) scalar samples or (B, T, out_channels) one-hot.
      logits:  (B, T, out_channels) raw head outputs (if requested).
      state:   final decoder carry (if requested).
    """
    if fold_weight_norm:
        params = make_generation_fast(params)

    buffers0, t0 = None, None
    if state is not None:
        x_in, buffers0, t_off = state
        initial_input = x_in
        t0 = jnp.asarray(t_off, jnp.int32)

    # Resolve batch/length from whichever inputs exist
    # (reference: wavenet.py:246-276).
    if test_inputs is not None:
        B = test_inputs.shape[0]
        T = test_inputs.shape[1] if T is None else max(T, test_inputs.shape[1])
    elif c is not None:
        B = c.shape[0]
    elif initial_input is not None:
        B = initial_input.shape[0]
    else:
        B = 1

    c_up = upsample_conditioning(params, spec, c)
    if c_up is not None:
        if T is None:
            T = c_up.shape[1]
        assert c_up.shape[1] == T, (c_up.shape, T)
    if T is None:
        raise ValueError("T must be given when no conditioning/test inputs")

    g_vec = embed_global(params, spec, g)

    if initial_input is None:
        initial_input = default_initial_input(spec, B)
    initial_input = initial_input.reshape(B, -1).astype(jnp.float32)

    n_test = None
    if test_inputs is not None:
        n_test = jnp.asarray(test_inputs.shape[1], dtype=jnp.int32)
        if test_inputs.shape[1] < T:
            pad = jnp.zeros((B, T - test_inputs.shape[1], test_inputs.shape[2]),
                            dtype=test_inputs.dtype)
            test_inputs = jnp.concatenate([test_inputs, pad], axis=1)
        test_inputs = test_inputs.astype(jnp.float32)

    out = _generate_scan(
        params, spec, rng, T=int(T), c_up=c_up, g_vec=g_vec,
        initial_input=initial_input, test_inputs=test_inputs, n_test=n_test,
        softmax=softmax, quantize=quantize,
        log_scale_min=float(log_scale_min), output=output,
        deterministic=deterministic, dtype=dtype,
        t0=t0, buffers0=buffers0, return_state=return_state)
    if return_state:
        x_last, buffers_last = out["state"]
        t_next = (0 if state is None else state[2]) + int(T)
        out["state"] = (x_last, buffers_last, t_next)
    return out
