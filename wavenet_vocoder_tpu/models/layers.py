"""Core parameterized layers as init/apply pure functions over param pytrees.

TPU-first design decisions (vs reference ``wavenet_vocoder/{conv,modules}.py``):

  * Layout is channels-LAST ``(B, T, C)`` everywhere: the feature dim maps to
    TPU lanes (128-wide), so residual_channels=128 / gate_channels=256 tile
    perfectly onto the VPU/MXU. The reference mixes (B,C,T) batch layout with
    (B,T,C) incremental layout (reference: wavenet.py:244-245); we have one.
  * Weight normalization is an explicit ``(g, v)`` factorization in the param
    pytree (reference wraps torch modules with ``nn.utils.weight_norm``,
    modules.py:18). ``remove_weight_norm`` folds g*v/||v|| into a plain kernel
    — the analogue of ``make_generation_fast_()`` (reference:
    wavenet.py:355-361) — so the generation scan reads pre-folded weights.
  * Causal convs pad left explicitly and use VALID windows, so there is no
    post-conv future-trim (the reference pads symmetrically then trims,
    modules.py:81-85, 136).
  * Convs store kernels as ``(K, In, Out)`` ('WIO'), matching
    ``lax.conv_general_dilated`` with ``('NWC','WIO','NWC')`` dimension
    numbers — no transposes in the hot path.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


# ----------------------------------------------------------------------
# Weight-normalized conv parameterization
# ----------------------------------------------------------------------
def init_conv(rng, kernel_size: int, in_ch: int, out_ch: int, *,
              bias: bool = True, weight_norm: bool = True,
              init: str = "kaiming", fill_value: Optional[float] = None) -> Params:
    """Create conv params ``{v, g, b}`` (weight-normed) or ``{w, b}``.

    Kaiming-normal init with relu gain + zero bias, then g initialized to the
    kernel norm so the initial effective weight equals the raw init — matching
    torch's ``weight_norm(kaiming_normal_(...))`` composition
    (reference: modules.py:13-18).
    """
    if fill_value is not None:
        w = jnp.full((kernel_size, in_ch, out_ch), fill_value, dtype=jnp.float32)
    elif init == "kaiming":
        fan_in = in_ch * kernel_size
        std = math.sqrt(2.0 / fan_in)
        w = std * jax.random.normal(rng, (kernel_size, in_ch, out_ch), dtype=jnp.float32)
    else:
        raise ValueError(init)

    p: Params = {}
    if weight_norm:
        # per-output-channel norm over (K, In)
        norm = jnp.sqrt(jnp.sum(w * w, axis=(0, 1)))  # (Out,)
        p["v"] = w
        p["g"] = norm
    else:
        p["w"] = w
    if bias:
        p["b"] = jnp.zeros((out_ch,), dtype=jnp.float32)
    return p


def conv_kernel(p: Params) -> jnp.ndarray:
    """Effective kernel, folding weight norm if present. Norm is taken over
    all axes but the last (output-channel) axis, so this works for both 1D
    (K, In, Out) and 2D (H, W, In, Out) kernels."""
    if "w" in p:
        return p["w"]
    v, g = p["v"], p["g"]
    axes = tuple(range(v.ndim - 1))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True) + 1e-12)
    return v * (g / norm)


def remove_weight_norm(p: Params) -> Params:
    """Fold (g, v) -> w. The 'fast generation' transform
    (reference: wavenet.py:355-361)."""
    if "w" in p:
        return dict(p)
    out = {"w": conv_kernel(p)}
    if "b" in p:
        out["b"] = p["b"]
    return out


def conv1x1(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv == matmul over the channel axis. x: (..., In) -> (..., Out).

    The kernel follows x's dtype (bf16 compute casts weights on the fly; f32
    masters stay in the param pytree)."""
    w = conv_kernel(p)[0].astype(x.dtype)  # (In, Out)
    y = jnp.dot(x, w, preferred_element_type=x.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def causal_conv(p: Params, x: jnp.ndarray, dilation: int = 1) -> jnp.ndarray:
    """Causal dilated 1D conv, channels-last.

    x: (B, T, In) -> (B, T, Out). Left-pads (k-1)*dilation so output[t]
    depends only on input[<=t] (reference pads both sides then trims,
    modules.py:81-85, 136 — same math, fewer FLOPs).
    """
    w = conv_kernel(p).astype(x.dtype)  # (K, In, Out)
    k = w.shape[0]
    pad = (k - 1) * dilation
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(1,),
        padding=[(pad, 0)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=x.dtype,
    )
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


def conv_step(p: Params, taps: jnp.ndarray) -> jnp.ndarray:
    """Single-timestep dilated conv as one matmul (the incremental path).

    taps: (B, K, In) — the K dilated input taps ordered oldest..newest,
    i.e. taps[:, j] = x[t - (K-1-j)*dilation]. Equivalent to the reference's
    linearized-weight ``F.linear`` trick (reference: conv.py:45, 51-62),
    but expressed as a (B, K*In) x (K*In, Out) matmul for the MXU.
    """
    w = conv_kernel(p).astype(taps.dtype)  # (K, In, Out)
    k, cin, cout = w.shape
    b_sz = taps.shape[0]
    y = jnp.dot(taps.reshape(b_sz, k * cin), w.reshape(k * cin, cout),
                preferred_element_type=taps.dtype)
    if "b" in p:
        y = y + p["b"].astype(y.dtype)
    return y


# ----------------------------------------------------------------------
# Embedding
# ----------------------------------------------------------------------
def init_embedding(rng, num_embeddings: int, embedding_dim: int,
                   std: float = 0.01) -> Params:
    """Speaker embedding table, N(0, 0.01) init (reference: modules.py:21-24)."""
    return {"table": std * jax.random.normal(
        rng, (num_embeddings, embedding_dim), dtype=jnp.float32)}


def embedding(p: Params, ids: jnp.ndarray) -> jnp.ndarray:
    """ids: (...,) int -> (..., embedding_dim)."""
    return jnp.take(p["table"], ids, axis=0)


# ----------------------------------------------------------------------
# Residual dilated conv block with gated activation
# ----------------------------------------------------------------------
_SQRT_HALF = math.sqrt(0.5)


def init_res_block(rng, *, residual_channels: int, gate_channels: int,
                   kernel_size: int, skip_out_channels: Optional[int] = None,
                   cin_channels: int = -1, gin_channels: int = -1,
                   bias: bool = True) -> Params:
    """WaveNet residual block params (reference: modules.py:71-107)."""
    if skip_out_channels is None:
        skip_out_channels = residual_channels
    keys = jax.random.split(rng, 5)
    p: Params = {
        "conv": init_conv(keys[0], kernel_size, residual_channels,
                          gate_channels, bias=bias),
        "out": init_conv(keys[1], 1, gate_channels // 2, residual_channels,
                         bias=bias),
        "skip": init_conv(keys[2], 1, gate_channels // 2, skip_out_channels,
                          bias=bias),
    }
    if cin_channels > 0:
        p["cond_c"] = init_conv(keys[3], 1, cin_channels, gate_channels,
                                bias=False)
    if gin_channels > 0:
        p["cond_g"] = init_conv(keys[4], 1, gin_channels, gate_channels,
                                bias=False)
    return p


def _gated(x: jnp.ndarray, p: Params, c: Optional[jnp.ndarray],
           g: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Split conv output into (a, b) halves, add conditioning projections to
    both, apply tanh(a)*sigmoid(b) (reference: modules.py:138-154)."""
    a, b = jnp.split(x, 2, axis=-1)
    if c is not None:
        ca, cb = jnp.split(conv1x1(p["cond_c"], c), 2, axis=-1)
        a, b = a + ca, b + cb
    if g is not None:
        ga, gb = jnp.split(conv1x1(p["cond_g"], g), 2, axis=-1)
        a, b = a + ga, b + gb
    return jnp.tanh(a) * jax.nn.sigmoid(b)


def res_block(p: Params, x: jnp.ndarray, c: Optional[jnp.ndarray] = None,
              g: Optional[jnp.ndarray] = None, *, dilation: int = 1,
              dropout: float = 0.0, rng=None):
    """Batch-mode residual block. x: (B, T, R) -> (residual_out, skip).

    (reference: modules.py:115-163)
    """
    residual = x
    if dropout > 0.0 and rng is not None:
        keep = 1.0 - dropout
        mask = jax.random.bernoulli(rng, keep, x.shape)
        x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
    x = causal_conv(p["conv"], x, dilation)
    x = _gated(x, p, c, g)
    s = conv1x1(p["skip"], x)
    out = (conv1x1(p["out"], x) + residual) * _SQRT_HALF
    return out, s


def res_block_step(p: Params, taps: jnp.ndarray,
                   ct: Optional[jnp.ndarray] = None,
                   gt: Optional[jnp.ndarray] = None):
    """Single-step residual block for the AR decoder.

    taps: (B, K, R) dilated input taps (oldest..newest; taps[:, -1] is x_t).
    ct/gt: (B, C) per-step conditioning. Returns (residual_out (B, R), skip).
    Mirrors the incremental path (reference: modules.py:112-163, conv.py:17-46)
    without any buffer mutation — state lives in the scan carry.
    """
    residual = taps[:, -1, :]
    x = conv_step(p["conv"], taps)
    x = _gated(x, p, ct, gt)
    s = conv1x1(p["skip"], x)
    out = (conv1x1(p["out"], x) + residual) * _SQRT_HALF
    return out, s
