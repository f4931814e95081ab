"""Checkpoint / resume (reference: train.py:852-970).

Full-fidelity resume: params + optimizer state + step/epoch/test-step
counters; ``checkpoint_latest`` convenience copies; a parallel EMA checkpoint
stream; ``--reset-optimizer`` and ``--restore-parts`` fine-tune modes
(reference: train.py:852-884, 930-947, 951-970).

Format: a pickled dict of numpy-ified pytrees — host-portable, independent of
device layout (device placement/sharding is re-established by the trainer on
load).
"""
from __future__ import annotations

import os
import pickle
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _to_numpy(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def checkpoint_path(directory: str, step: int, ema: bool = False) -> str:
    """(reference: train.py:856-860 naming)."""
    suffix = "_ema" if ema else ""
    return os.path.join(directory, f"checkpoint_step{step:09d}{suffix}.pkl")


def latest_path(directory: str, ema: bool = False) -> str:
    suffix = "_ema" if ema else ""
    return os.path.join(directory, f"checkpoint_latest{suffix}.pkl")


def save_checkpoint(directory: str, state, *, global_step: int,
                    global_epoch: int = 0, global_test_step: int = 0,
                    save_optimizer_state: bool = True) -> str:
    """Write step-stamped + latest checkpoints, and the EMA twin stream when
    EMA params exist (reference: train.py:852-884)."""
    os.makedirs(directory, exist_ok=True)
    payload: Dict[str, Any] = {
        "params": _to_numpy(state.params),
        "optimizer_state": (_to_numpy(state.opt_state)
                            if save_optimizer_state else None),
        "global_step": int(global_step),
        "global_epoch": int(global_epoch),
        "global_test_step": int(global_test_step),
    }
    path = checkpoint_path(directory, global_step)
    with open(path, "wb") as f:
        pickle.dump(payload, f)
    shutil.copyfile(path, latest_path(directory))

    if state.ema_params is not None:
        # EMA checkpoint stores averaged weights as the model params
        # (reference: train.py:871-884 clone_as_averaged_model)
        ema_payload = dict(payload)
        ema_payload["params"] = _to_numpy(state.ema_params)
        ema_path = checkpoint_path(directory, global_step, ema=True)
        with open(ema_path, "wb") as f:
            pickle.dump(ema_payload, f)
        shutil.copyfile(ema_path, latest_path(directory, ema=True))
    return path


def load_checkpoint(path: str, state, *, reset_optimizer: bool = False
                    ) -> Tuple[Any, Dict[str, int]]:
    """Restore params (+optimizer unless reset) + counters into ``state``
    (reference: train.py:930-947)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = jax.tree.map(lambda ref, v: np.asarray(v, dtype=ref.dtype),
                          state.params, payload["params"])
    opt_state = state.opt_state
    if not reset_optimizer and payload.get("optimizer_state") is not None:
        opt_state = jax.tree.map(
            lambda ref, v: np.asarray(v), state.opt_state,
            payload["optimizer_state"])
    ema = state.ema_params
    if ema is not None:
        # resume EMA from the twin file if present, else re-seed from params
        ema_file = _ema_twin(path)
        if ema_file and os.path.exists(ema_file):
            with open(ema_file, "rb") as f:
                ema = jax.tree.map(lambda ref, v: np.asarray(v, dtype=ref.dtype),
                                   state.ema_params, pickle.load(f)["params"])
        else:
            ema = jax.tree.map(np.copy, params)
    counters = {
        "global_step": payload.get("global_step", 0),
        "global_epoch": payload.get("global_epoch", 0),
        "global_test_step": payload.get("global_test_step", 0),
    }
    new_state = state.replace(
        params=params, opt_state=opt_state, ema_params=ema,
        step=np.asarray(counters["global_step"], dtype=np.int32))
    return new_state, counters


def _ema_twin(path: str) -> Optional[str]:
    if path.endswith("_ema.pkl"):
        return None
    base, ext = os.path.splitext(path)
    return base + "_ema" + ext


def restore_parts(path: str, params) -> Any:
    """Partial / fine-tune restore: copy every leaf whose path and shape
    match; keep the fresh init elsewhere (reference: train.py:951-970)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    src = payload["params"] if isinstance(payload, dict) and "params" in payload else payload

    src_leaves = dict(_flatten_with_paths(src))
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


def _flatten_with_paths(tree):
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return [(jax.tree_util.keystr(kp), leaf) for kp, leaf in flat]
