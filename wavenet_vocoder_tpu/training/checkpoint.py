"""Checkpoint / resume (reference: train.py:852-970).

Full-fidelity resume: params + optimizer state + step/epoch/test-step
counters; ``checkpoint_latest`` convenience copies; a parallel EMA checkpoint
stream; ``--reset-optimizer`` and ``--restore-parts`` fine-tune modes
(reference: train.py:852-884, 930-947, 951-970).

Format (v1, ``.npz``): flat numpy arrays + a JSON manifest embedded as a
uint8 array — loading never executes pickled code (the reference's
``torch.load`` format is arbitrary-code-exec on load; this one is not).
Writes are atomic (tmp + ``os.replace``) so a crash mid-save can never
corrupt an existing checkpoint, and ``load_checkpoint`` falls back from a
corrupted ``checkpoint_latest`` to the newest intact step file. Legacy
pickle checkpoints written by earlier versions still load.
"""
from __future__ import annotations

import glob
import json
import os
import pickle
import re
from typing import Any, Dict, List, Optional, Tuple

import jax
import numpy as np

_FORMAT = "wavenet-tpu-ckpt"
_VERSION = 1


def checkpoint_path(directory: str, step: int, ema: bool = False) -> str:
    """(reference: train.py:856-860 naming)."""
    suffix = "_ema" if ema else ""
    return os.path.join(directory, f"checkpoint_step{step:09d}{suffix}.npz")


def latest_path(directory: str, ema: bool = False) -> str:
    suffix = "_ema" if ema else ""
    return os.path.join(directory, f"checkpoint_latest{suffix}.npz")


def _flatten_with_paths(tree) -> List[Tuple[str, Any]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(kp), leaf) for kp, leaf in flat]


def _write_npz_atomic(path: str, params, opt_state, counters: Dict[str, int],
                      ) -> None:
    arrays: Dict[str, np.ndarray] = {}
    p_flat = _flatten_with_paths(params)
    manifest: Dict[str, Any] = {
        "format": _FORMAT, "version": _VERSION,
        "param_paths": [k for k, _ in p_flat],
        "has_opt": opt_state is not None,
        **counters,
    }
    for i, (_, leaf) in enumerate(p_flat):
        arrays[f"param_{i}"] = np.asarray(leaf)
    if opt_state is not None:
        o_flat = jax.tree.leaves(opt_state)
        manifest["n_opt"] = len(o_flat)
        for i, leaf in enumerate(o_flat):
            arrays[f"opt_{i}"] = np.asarray(leaf)
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode("utf-8"), dtype=np.uint8)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


class _Payload:
    """Uniform view over v1 npz and legacy pickle checkpoints."""

    def __init__(self, params_flat, param_paths, opt_flat, counters):
        self.params_flat = params_flat          # list of np arrays
        self.param_paths = param_paths          # list of keystr (may be None)
        self.opt_flat = opt_flat                # list of np arrays or None
        self.counters = counters                # dict of ints


def _read_payload(path: str) -> _Payload:
    """Parse a checkpoint file (npz v1 or legacy pickle). Raises on any
    corruption — callers decide whether to fall back."""
    with open(path, "rb") as f:
        head = f.read(4)
    if head[:2] == b"PK":  # zip magic -> npz
        with np.load(path, allow_pickle=False) as z:
            manifest = json.loads(bytes(z["manifest"].tobytes()).decode())
            if manifest.get("format") != _FORMAT:
                raise ValueError(f"{path}: unrecognized checkpoint manifest")
            paths = manifest["param_paths"]
            params_flat = [z[f"param_{i}"] for i in range(len(paths))]
            opt_flat = None
            if manifest.get("has_opt"):
                opt_flat = [z[f"opt_{i}"]
                            for i in range(manifest["n_opt"])]
            counters = {k: int(manifest.get(k, 0)) for k in
                        ("global_step", "global_epoch", "global_test_step")}
            return _Payload(params_flat, paths, opt_flat, counters)
    # legacy pickle (pre-v1 checkpoints; load-bearing back-compat only)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if not (isinstance(payload, dict) and "params" in payload):
        raise ValueError(f"{path}: not a checkpoint payload")
    p_flat = _flatten_with_paths(payload["params"])
    opt = payload.get("optimizer_state")
    opt_flat = None if opt is None else [np.asarray(x)
                                         for x in jax.tree.leaves(opt)]
    counters = {k: int(payload.get(k, 0)) for k in
                ("global_step", "global_epoch", "global_test_step")}
    return _Payload([np.asarray(v) for _, v in p_flat],
                    [k for k, _ in p_flat], opt_flat, counters)


def save_checkpoint(directory: str, state, *, global_step: int,
                    global_epoch: int = 0, global_test_step: int = 0,
                    save_optimizer_state: bool = True) -> str:
    """Write step-stamped + latest checkpoints, and the EMA twin stream when
    EMA params exist (reference: train.py:852-884). Every file is written
    atomically; an interrupt mid-save leaves prior checkpoints intact."""
    os.makedirs(directory, exist_ok=True)
    counters = {"global_step": int(global_step),
                "global_epoch": int(global_epoch),
                "global_test_step": int(global_test_step)}
    opt = state.opt_state if save_optimizer_state else None
    path = checkpoint_path(directory, global_step)
    _write_npz_atomic(path, state.params, opt, counters)
    _write_npz_atomic(latest_path(directory), state.params, opt, counters)

    if state.ema_params is not None:
        # EMA checkpoint stores averaged weights as the model params
        # (reference: train.py:871-884 clone_as_averaged_model)
        _write_npz_atomic(checkpoint_path(directory, global_step, ema=True),
                          state.ema_params, opt, counters)
        _write_npz_atomic(latest_path(directory, ema=True),
                          state.ema_params, opt, counters)
    return path


_STEP_RE = re.compile(r"checkpoint_step(\d+)(_ema)?\.(npz|pkl)$")


def _step_files(directory: str, ema: bool) -> List[Tuple[int, str]]:
    out = []
    for p in glob.glob(os.path.join(directory, "checkpoint_step*")):
        m = _STEP_RE.search(os.path.basename(p))
        if m and bool(m.group(2)) == ema:
            out.append((int(m.group(1)), p))
    return sorted(out, reverse=True)


def _read_with_fallback(path: str) -> Tuple[_Payload, str]:
    """Read ``path``; if it is a corrupted ``checkpoint_latest`` file, fall
    back to the newest intact step checkpoint in the same directory."""
    try:
        return _read_payload(path), path
    except Exception as e:  # noqa: BLE001 — any parse failure triggers fallback
        base = os.path.basename(path)
        if not base.startswith("checkpoint_latest"):
            raise
        ema = "_ema" in base
        for _, cand in _step_files(os.path.dirname(path) or ".", ema):
            try:
                payload = _read_payload(cand)
            except Exception:  # noqa: BLE001
                continue
            print(f"WARNING: {path} is unreadable ({e!r}); "
                  f"falling back to {cand}")
            return payload, cand
        raise


def _unflatten_like(ref_tree, flat: List[np.ndarray], *, cast: bool):
    ref_flat, treedef = jax.tree_util.tree_flatten(ref_tree)
    if len(ref_flat) != len(flat):
        raise ValueError(
            f"checkpoint has {len(flat)} tensors; model expects "
            f"{len(ref_flat)} — wrong architecture or preset?")
    if cast:
        # ref leaves may be jax.ShapeDtypeStruct (from eval_shape) — prefer
        # the .dtype attribute over materializing with np.asarray
        flat = [np.asarray(v, dtype=(r.dtype if hasattr(r, "dtype")
                                     else np.asarray(r).dtype))
                for r, v in zip(ref_flat, flat)]
    return jax.tree_util.tree_unflatten(treedef, flat)


def load_checkpoint(path: str, state, *, reset_optimizer: bool = False
                    ) -> Tuple[Any, Dict[str, int]]:
    """Restore params (+optimizer unless reset) + counters into ``state``
    (reference: train.py:930-947)."""
    payload, path = _read_with_fallback(path)
    params = _unflatten_like(state.params, payload.params_flat, cast=True)
    opt_state = state.opt_state
    if not reset_optimizer and payload.opt_flat is not None:
        opt_state = _unflatten_like(state.opt_state, payload.opt_flat,
                                    cast=False)
    ema = state.ema_params
    if ema is not None:
        # resume EMA from the twin file if present, else re-seed from params
        ema_file = _ema_twin(path)
        if ema_file and os.path.exists(ema_file):
            ema_payload = _read_payload(ema_file)
            ema = _unflatten_like(state.ema_params, ema_payload.params_flat,
                                  cast=True)
        else:
            ema = jax.tree.map(np.copy, params)
    counters = payload.counters
    new_state = state.replace(
        params=params, opt_state=opt_state, ema_params=ema,
        step=np.asarray(counters["global_step"], dtype=np.int32))
    return new_state, counters


def _ema_twin(path: str) -> Optional[str]:
    base, ext = os.path.splitext(path)
    if base.endswith("_ema"):
        return None
    return base + "_ema" + ext


def load_params(path: str):
    """Read just the model params (+counters) from a checkpoint — the
    inference-side loader used by the synthesis/evaluate CLIs. Returns a
    payload whose params callers unflatten onto their model's treedef via
    :func:`params_like`; counters are in ``payload.counters``."""
    payload, _ = _read_with_fallback(path)
    return payload


def params_like(ref_params, payload: _Payload):
    """Unflatten a checkpoint payload's params onto ``ref_params``'s
    structure (dtype-cast to the reference leaves)."""
    return _unflatten_like(ref_params, payload.params_flat, cast=True)


_TOKEN_RE = re.compile(r"\[('[^']*'|\d+)\]")


def params_tree(payload: _Payload):
    """Rebuild the saved params pytree (nested dicts / lists) from the
    flat leaves + keystr paths — the structure AS SAVED, independent of any
    model config (mirrors the legacy pickle loader's behavior: a model built
    with fewer conditioning inputs simply ignores the extra entries)."""
    root: Dict[Any, Any] = {}
    for key, leaf in zip(payload.param_paths, payload.params_flat):
        tokens = [t[1:-1] if t.startswith("'") else int(t)
                  for t in _TOKEN_RE.findall(key)]
        if not tokens:
            raise ValueError(f"unparseable param path {key!r}")
        node = root
        for tok, nxt in zip(tokens[:-1], tokens[1:]):
            node = node.setdefault(tok, {})
        node[tokens[-1]] = leaf

    def finalize(node):
        if not isinstance(node, dict):
            return node
        if node and all(isinstance(k, int) for k in node):
            return [finalize(node[i]) for i in range(len(node))]
        return {k: finalize(v) for k, v in node.items()}

    return finalize(root)


def restore_parts(path: str, params) -> Any:
    """Partial / fine-tune restore: copy every leaf whose path and shape
    match; keep the fresh init elsewhere (reference: train.py:951-970)."""
    payload, _ = _read_with_fallback(path)
    src_leaves = dict(zip(payload.param_paths, payload.params_flat))
    out_flat = []
    n_restored = 0
    for key, leaf in _flatten_with_paths(params):
        cand = src_leaves.get(key)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out_flat.append(np.asarray(cand, dtype=np.asarray(leaf).dtype))
            n_restored += 1
        else:
            out_flat.append(leaf)

    treedef = jax.tree.structure(params)
    restored = jax.tree.unflatten(treedef, out_flat)
    print(f"restore_parts: restored {n_restored} tensors from {path}")
    return restored
