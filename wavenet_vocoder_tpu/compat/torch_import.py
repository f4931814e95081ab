"""Import reference (r9y9/wavenet_vocoder) PyTorch checkpoints.

Converts a reference ``checkpoint_step*.pth`` — a dict of
``{state_dict, optimizer, global_step, global_epoch, global_test_step}``
(reference: train.py:852-884) — into this framework's param pytree, so
published torch models (e.g. the pretrained LJSpeech MoL checkpoints,
reference: README.md:36-41) can be served/fine-tuned on TPU directly.

Weight-layout mapping (inverse of tests/test_reference_oracle.py's
transplant direction):

  torch Conv1d          weight_v (Out, In, K), weight_g (Out, 1, 1), bias
    -> ours {v: (K, In, Out), g: (Out,), b: (Out,)}   (layers.py init_conv)
  torch Conv2d (upsample smoothing, reference: upsample.py:37-49)
    weight_v (1, 1, freq, time) -> ours {v: (time, freq, 1, 1), g: (1,)}
  torch Embedding weight -> ours {table}

Both the weight-normed form (``weight_v``/``weight_g``; reference:
modules.py:18) and the folded form after ``make_generation_fast_()``
(plain ``weight``; reference: wavenet.py:355-361) are handled — torch's
weight_norm dim=0 per-output-channel norm matches our (g, v) factorization
exactly (layers.py:56-76).

The torch Adam state is NOT mapped (optax's tree differs structurally);
imported checkpoints resume with a fresh optimizer — the same semantics as
the reference's ``--reset-optimizer`` fine-tune mode (reference:
train.py:930-947).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from wavenet_vocoder_tpu.models.wavenet import WaveNetSpec

Params = Dict[str, Any]


def _np(x) -> np.ndarray:
    """torch.Tensor | array-like -> float32/original-dtype numpy array."""
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def strip_module_prefix(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Drop a uniform 'module.' prefix (torch DataParallel-wrapped saves)."""
    if sd and all(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return dict(sd)


def _conv_from(sd: Dict[str, Any], prefix: str, consumed: set) -> Params:
    """torch (weight-normed or folded) conv -> our conv params.

    Handles Conv1d and Conv2d alike: torch's (Out, In, K) / (out, in, freq,
    time) layouts map to ours — (K, In, Out) / (time, freq, in, out) — by a
    full axis reversal (``.T``). Records every state-dict key it reads in
    ``consumed`` so the caller can detect leftovers (wrong-preset imports).
    """
    p: Params = {}
    if f"{prefix}.weight_v" in sd:
        v = _np(sd[f"{prefix}.weight_v"])
        p["v"] = np.ascontiguousarray(v.T).astype(np.float32)
        p["g"] = _np(sd[f"{prefix}.weight_g"]).reshape(-1).astype(np.float32)
        consumed.update((f"{prefix}.weight_v", f"{prefix}.weight_g"))
    elif f"{prefix}.weight" in sd:
        w = _np(sd[f"{prefix}.weight"])
        p["w"] = np.ascontiguousarray(w.T).astype(np.float32)
        consumed.add(f"{prefix}.weight")
    else:
        raise KeyError(f"no conv weight under '{prefix}' "
                       f"(looked for .weight_v / .weight)")
    if f"{prefix}.bias" in sd:
        p["b"] = _np(sd[f"{prefix}.bias"]).astype(np.float32)
        consumed.add(f"{prefix}.bias")
    return p


def _upsample_convs_from(sd: Dict[str, Any], prefix: str,
                         consumed: set) -> Params:
    """Collect the per-scale smoothing Conv2ds of a reference UpsampleNetwork.

    up_layers interleaves parameter-free Stretch2d (and optional activation)
    modules with the weight-normed Conv2ds (reference: upsample.py:37-49), so
    only some indices appear in the state dict — take them in index order.
    """
    idxs = set()
    for k in sd:
        if k.startswith(f"{prefix}.up_layers."):
            idxs.add(int(k[len(f"{prefix}.up_layers."):].split(".")[0]))
    if not idxs:
        raise KeyError(f"no '{prefix}.up_layers.*' keys in state dict")
    return {"convs": [_conv_from(sd, f"{prefix}.up_layers.{j}", consumed)
                      for j in sorted(idxs)]}


def params_from_state_dict(sd: Dict[str, Any], spec: WaveNetSpec) -> Params:
    """Reference WaveNet state_dict -> our param pytree (models/wavenet.py
    init_wavenet structure). Raises KeyError/ValueError on mismatch —
    including checkpoint weights the spec has no slot for (wrong preset)."""
    sd = strip_module_prefix(sd)
    consumed: set = set()

    params: Params = {
        "first_conv": _conv_from(sd, "first_conv", consumed),
        "blocks": [],
        # head: last_conv_layers = [ReLU, 1x1, ReLU, 1x1]
        # (reference: wavenet.py:136-141)
        "last_conv1": _conv_from(sd, "last_conv_layers.1", consumed),
        "last_conv2": _conv_from(sd, "last_conv_layers.3", consumed),
    }
    for i in range(spec.layers):
        pre = f"conv_layers.{i}"
        bp: Params = {
            "conv": _conv_from(sd, f"{pre}.conv", consumed),
            "out": _conv_from(sd, f"{pre}.conv1x1_out", consumed),
            "skip": _conv_from(sd, f"{pre}.conv1x1_skip", consumed),
        }
        if spec.has_local_conditioning:
            bp["cond_c"] = _conv_from(sd, f"{pre}.conv1x1c", consumed)
        if spec.has_global_conditioning:
            bp["cond_g"] = _conv_from(sd, f"{pre}.conv1x1g", consumed)
        params["blocks"].append(bp)

    if spec.has_speaker_embedding:
        params["embed_speakers"] = {
            "table": _np(sd["embed_speakers.weight"]).astype(np.float32)}
        consumed.add("embed_speakers.weight")

    if spec.upsample_conditional_features:
        if spec.upsample_net == "ConvInUpsampleNetwork":
            params["upsample_net"] = {
                "conv_in": _conv_from(sd, "upsample_net.conv_in", consumed),
                "upsample": _upsample_convs_from(
                    sd, "upsample_net.upsample", consumed),
            }
        else:
            params["upsample_net"] = _upsample_convs_from(
                sd, "upsample_net", consumed)

    leftover = sorted(set(sd) - consumed)
    if leftover:
        raise ValueError(
            f"checkpoint has {len(leftover)} weights the spec has no slot "
            f"for (wrong preset? e.g. conditioning/upsample disabled): "
            f"{leftover[:8]}{'...' if len(leftover) > 8 else ''}")

    validate_params(params, spec)
    return params


def validate_params(params: Params, spec: WaveNetSpec) -> None:
    """Assert the imported pytree matches init_wavenet's structure+shapes.

    Uses jax.eval_shape so no actual init compute runs. Weight-norm form may
    legitimately differ per-leaf ({v,g} imported vs {v,g} init — same; a
    folded checkpoint yields {w} where init has {v,g}), so compare effective
    kernel shapes instead of raw leaf names for conv nodes.
    """
    import jax

    from wavenet_vocoder_tpu.models.wavenet import init_wavenet

    ref_shapes = jax.eval_shape(lambda k: init_wavenet(k, spec),
                                jax.random.PRNGKey(0))

    def eff_shape(node):
        """conv params -> effective kernel shape (+ bias marker)."""
        if "w" in node:
            return tuple(np.shape(node["w"])), "b" in node
        return tuple(np.shape(node["v"])), "b" in node

    def walk(a, b, path=""):
        if isinstance(b, dict) and ("v" in b or "w" in b):
            sa, ba = eff_shape(a)
            sb, bb = eff_shape(b)
            if sa != sb or ba != bb:
                raise ValueError(
                    f"shape mismatch at {path}: imported {sa} (bias={ba}) "
                    f"vs expected {sb} (bias={bb})")
            return
        if isinstance(b, dict):
            if set(a) != set(b):
                raise ValueError(f"key mismatch at {path}: "
                                 f"{sorted(a)} vs {sorted(b)}")
            for k in b:
                walk(a[k], b[k], f"{path}.{k}")
            return
        if isinstance(b, (list, tuple)):
            if len(a) != len(b):
                raise ValueError(f"length mismatch at {path}")
            for i, (x, y) in enumerate(zip(a, b)):
                walk(x, y, f"{path}[{i}]")
            return
        if tuple(np.shape(a)) != tuple(b.shape):
            raise ValueError(f"shape mismatch at {path}: "
                             f"{np.shape(a)} vs {tuple(b.shape)}")

    walk(params, ref_shapes)


def load_torch_checkpoint(path: str, spec: WaveNetSpec
                          ) -> Tuple[Params, Dict[str, int]]:
    """Load a reference .pth checkpoint -> (params pytree, counters).

    Accepts either the full training checkpoint dict (reference:
    train.py:852-884) or a bare state_dict.
    """
    import torch  # local: torch is an optional, import-time-free dependency

    try:
        payload = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        # older reference checkpoints may pickle non-tensor objects
        payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "state_dict" in payload:
        sd = payload["state_dict"]
        counters = {
            "global_step": int(payload.get("global_step", 0) or 0),
            "global_epoch": int(payload.get("global_epoch", 0) or 0),
            "global_test_step": int(payload.get("global_test_step", 0) or 0),
        }
    else:
        sd = payload
        counters = {"global_step": 0, "global_epoch": 0,
                    "global_test_step": 0}
    return params_from_state_dict(sd, spec), counters


def ema_twin_path(path: str) -> Optional[str]:
    """checkpoint_stepX.pth -> checkpoint_stepX_ema.pth if it exists
    (the reference's averaged-weights twin stream, train.py:871-884)."""
    base, ext = os.path.splitext(path)
    if base.endswith("_ema"):
        return None
    cand = base + "_ema" + ext
    return cand if os.path.exists(cand) else None
