"""FLOP accounting for benchmark honesty (MFU reporting).

``forward_flops_per_sample`` is the analytic matmul-dominated count for one
generated/trained sample; ``xla_cost_flops`` asks the compiled executable
(exact, includes upsampling network and backward pass). MFU = achieved
FLOP/s divided by the chip's peak; peaks are per-generation bf16 numbers
from the public TPU spec sheets.
"""
from __future__ import annotations

from typing import Optional

import jax


def forward_flops_per_sample(spec) -> int:
    """Analytic forward FLOPs (2 x MACs) per output sample of the WaveNet
    stack (excludes the tiny conditioning upsampler, <1% for the flagship).
    Reference cost structure: wavenet.py:164-213 forward.
    """
    k = spec.kernel_size
    R = spec.residual_channels
    G = spec.gate_channels
    G2 = G // 2
    S = spec.skip_out_channels
    total = 2 * spec.in_channels * R
    per_layer = 2 * k * R * G + 2 * G2 * R + 2 * G2 * S
    if spec.has_local_conditioning:
        per_layer += 2 * spec.cin_channels * G
    if spec.has_global_conditioning:
        per_layer += 2 * spec.gin_channels * G
    total += spec.layers * per_layer
    total += 2 * S * S + 2 * S * spec.out_channels
    return total


def train_flops_per_sample(spec) -> int:
    """Forward + backward ≈ 3x forward (each matmul has two grad matmuls)."""
    return 3 * forward_flops_per_sample(spec)


def xla_cost_analysis(jitted_fn, *args, **kwargs) -> Optional[dict]:
    """The compiled executable's cost analysis dict ('flops',
    'bytes accessed', ...); None when the backend doesn't report it."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return dict(ca) if ca else None
    except Exception:
        return None


def xla_cost_flops(jitted_fn, *args, **kwargs) -> Optional[float]:
    """Exact per-invocation FLOPs from the compiled executable's cost
    analysis; None when the backend doesn't report it."""
    ca = xla_cost_analysis(jitted_fn, *args, **kwargs)
    if not ca:
        return None
    flops = float(ca.get("flops", 0.0))
    return flops if flops > 0 else None


# bf16 matmul peak FLOP/s by device kind substring (public spec sheets)
_PEAKS = (
    ("v5 lite", 197e12), ("v5e", 197e12),
    ("v5p", 459e12), ("v5", 459e12),
    ("v6 lite", 918e12), ("v6e", 918e12),
    ("v4", 275e12),
    ("v3", 123e12),
    ("v2", 45e12),
)


def device_peak_flops(device=None) -> Optional[float]:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, peak in _PEAKS:
        if sub in kind:
            return peak
    return None


# HBM bandwidth (bytes/s) by device kind substring (public spec sheets)
_HBM_BW = (
    ("v5 lite", 819e9), ("v5e", 819e9),
    ("v5p", 2765e9), ("v5", 2765e9),
    ("v6 lite", 1640e9), ("v6e", 1640e9),
    ("v4", 1228e9),
    ("v3", 900e9),
    ("v2", 700e9),
)


def device_peak_hbm_bw(device=None) -> Optional[float]:
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for sub, bw in _HBM_BW:
        if sub in kind:
            return bw
    return None
