"""Mel-to-sample-rate upsampling networks for local conditioning.

Parity targets (reference: wavenet_vocoder/upsample.py):
  * ``stretch_time``: nearest-neighbor time stretch (reference: upsample.py:12-21).
  * ``UpsampleNetwork``: per scale s — stretch x s, then a weight-normed
    single-channel 2D smoothing conv, kernel (freq_axis_kernel_size, 2s+1),
    averaging-initialized, bias-free (reference: upsample.py:37-49); trims
    ``cin_pad * prod(scales)`` indent from both ends (reference:
    upsample.py:36, 64-65).
  * ``ConvInUpsampleNetwork`` (the default): prepends an unpadded (VALID)
    context conv1d with kernel 2*cin_pad+1 over mel frames before upsampling
    (reference: upsample.py:77-85), so the inner upsampler runs with
    cin_pad=0.

Layout here is channels-last: c is (B, T_mel, C_mel). The 2D smoothing conv
treats (time, mel-bin) as the image plane with a single channel (NHWC with
H=time, W=freq). Static structure (scales, pads) lives in the caller's config,
NOT in the param pytree — params hold only arrays so they compose cleanly with
jax.grad/optax/jit.
"""
from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from wavenet_vocoder_tpu.models.layers import conv_kernel, init_conv

Params = Dict[str, Any]


def stretch_time(c: jnp.ndarray, scale: int) -> jnp.ndarray:
    """Nearest-neighbor upsample along time. c: (B, T, C) -> (B, T*scale, C)."""
    return jnp.repeat(c, scale, axis=1)


def init_upsample_network(rng, *, upsample_scales: Sequence[int],
                          freq_axis_kernel_size: int = 1,
                          cin_channels: int = 80, **_unused) -> Params:
    """Per-scale smoothing convs. Kernel (2s+1, freq_k) in (H=time, W=freq)
    layout, filled with 1/prod(kernel) and weight-normed, bias-free
    (reference: upsample.py:42-44)."""
    del rng, cin_channels  # deterministic averaging init; channel count unused
    convs = []
    for scale in upsample_scales:
        kh, kw = 2 * int(scale) + 1, int(freq_axis_kernel_size)
        w = jnp.full((kh, kw, 1, 1), 1.0 / (kh * kw), dtype=jnp.float32)
        norm = jnp.sqrt(jnp.sum(w * w, axis=(0, 1, 2)))  # (1,)
        convs.append({"v": w, "g": norm})
    return {"convs": convs}


_conv2d_kernel = conv_kernel


_ACTIVATIONS = {
    "none": None,
    "ReLU": jax.nn.relu,
    "LeakyReLU": jax.nn.leaky_relu,
    "Tanh": jnp.tanh,
    "Sigmoid": jax.nn.sigmoid,
}


def apply_upsample_network(p: Params, c: jnp.ndarray, *,
                           upsample_scales: Sequence[int],
                           cin_pad: int = 0,
                           upsample_activation: str = "none",
                           upsample_activation_params: dict = {},
                           **_unused) -> jnp.ndarray:
    """c: (B, T_mel, C_mel) -> (B, T_mel * prod(scales) - 2*indent, C_mel).

    Optional per-scale nonlinearity selected by torch-style name
    (reference: upsample.py:24-26, 47-49)."""
    act = _ACTIVATIONS[upsample_activation]
    x = c[..., None]  # (B, T, C, 1) NHWC: H=time, W=freq
    for scale, cp in zip(upsample_scales, p["convs"]):
        scale = int(scale)
        x = jnp.repeat(x, scale, axis=1)
        w = _conv2d_kernel(cp)  # (2s+1, freq_k, 1, 1)
        kw = w.shape[1]
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=(1, 1),
            padding=[(scale, scale), ((kw - 1) // 2, (kw - 1) // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=x.dtype,
        )
        if act is not None:
            x = act(x, **upsample_activation_params)
    x = x[..., 0]  # (B, T, C)
    indent = int(cin_pad) * int(np.prod(upsample_scales))
    if indent > 0:
        x = x[:, indent:-indent, :]
    return x


def init_conv_in_upsample_network(rng, *, upsample_scales: Sequence[int],
                                  freq_axis_kernel_size: int = 1,
                                  cin_pad: int = 0,
                                  cin_channels: int = 80, **_unused) -> Params:
    """Context conv1d (VALID, kernel 2*cin_pad+1, bias-free) + inner
    UpsampleNetwork (reference: upsample.py:74-81)."""
    ks = 2 * int(cin_pad) + 1
    k_conv, k_up = jax.random.split(rng)
    return {
        "conv_in": init_conv(k_conv, ks, cin_channels, cin_channels, bias=False),
        "upsample": init_upsample_network(
            k_up, upsample_scales=upsample_scales,
            freq_axis_kernel_size=freq_axis_kernel_size,
            cin_channels=cin_channels),
    }


def apply_conv_in_upsample_network(p: Params, c: jnp.ndarray, *,
                                   upsample_scales: Sequence[int],
                                   **_unused) -> jnp.ndarray:
    """c: (B, T_mel, C_mel) -> (B, (T_mel - 2*cin_pad) * prod(scales), C_mel).

    The context conv consumes the cin_pad frames (VALID), so the inner
    upsampler trims nothing (cin_pad=0; reference: upsample.py:79-81).
    """
    w = conv_kernel(p["conv_in"])  # (ks, C, C)
    x = jax.lax.conv_general_dilated(
        c, w.astype(c.dtype),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=c.dtype,
    )
    return apply_upsample_network(
        p["upsample"], x, upsample_scales=upsample_scales, cin_pad=0,
        upsample_activation=_unused.get("upsample_activation", "none"),
        upsample_activation_params=_unused.get(
            "upsample_activation_params", {}))


UPSAMPLE_NETS = {
    "UpsampleNetwork": (init_upsample_network, apply_upsample_network),
    "ConvInUpsampleNetwork": (init_conv_in_upsample_network,
                              apply_conv_in_upsample_network),
}
