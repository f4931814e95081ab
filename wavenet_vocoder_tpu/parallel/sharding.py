"""Device-mesh parallelism (replaces torch DataParallel,
reference: train.py:676-689).

Design (SURVEY.md section 5.8): one ``jax.sharding.Mesh`` spans the slice.
  * Training: data-parallel — batch sharded over the ``data`` axis, params
    replicated (the largest reference config is ~10M params, far under one
    chip's HBM). Gradients are all-reduced by XLA-inserted psum over ICI when
    the jitted step sees sharded batch + replicated params.
  * Batched synthesis: independent utterances sharded over chips along the
    batch axis — zero inter-chip communication; results gathered on host.
  * EMA/optimizer state shard like params (replicated).

The reference's only parallelism is single-host multi-GPU replicate/scatter/
gather with a ``batch_size % num_gpu == 0`` constraint (reference:
train.py:681-689, README.md:176); here any batch divisible by the mesh's data
axis works across hosts as well (DCN handled by the same collectives).
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axes: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a Mesh from an axis spec like {"data": -1} or
    {"data": 4, "model": 2}; -1 fills with the remaining devices."""
    axes = dict(axes or {"data": -1})
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    sizes = list(axes.values())
    n_fill = sizes.count(-1)
    if n_fill > 1:
        raise ValueError("at most one -1 axis")
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    if n_fill:
        if n % fixed != 0:
            raise ValueError(f"{n} devices not divisible by {fixed}")
        sizes = [s if s != -1 else n // fixed for s in sizes]
    if int(np.prod(sizes)) != n:
        raise ValueError(f"mesh {dict(zip(axes, sizes))} != {n} devices")
    arr = np.asarray(devices).reshape(sizes)
    return Mesh(arr, tuple(axes.keys()))


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Place a pytree fully replicated on the mesh (params/opt state/EMA)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data") -> Any:
    """Shard every array's leading (batch) dim over the given mesh axis.
    Non-array leaves pass through."""
    def put(x):
        if x is None:
            return None
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim == 0:
            return jax.device_put(x, NamedSharding(mesh, P()))
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch, is_leaf=lambda x: x is None)


def data_parallel_batch_size(cfg_batch_size: int, mesh: Mesh,
                             axis: str = "data") -> int:
    """Round the global batch up to a multiple of the data axis (the
    reference hard-errors on batch_size % num_gpu != 0, README.md:176)."""
    n = mesh.shape[axis]
    return ((cfg_batch_size + n - 1) // n) * n


def shard_state(state, mesh: Mesh):
    """Replicate the full TrainState on the mesh."""
    return replicate(state, mesh)


# ----------------------------------------------------------------------
# Tensor parallelism over the gate-channel axis (for oversized configs)
# ----------------------------------------------------------------------
def wavenet_param_shardings(params: Any, mesh: Mesh,
                            axis: str = "model") -> Any:
    """Megatron-style sharding rules for the WaveNet param pytree.

    Column-parallel on the gated projection (dilated conv + conditioning 1x1s
    produce gate channels sharded over ``axis``), row-parallel on the
    skip/out 1x1s (contract over the sharded gate dim — XLA inserts the
    psum). First/last convs and embeddings replicate. With axis size 1 this
    degenerates to full replication.

    Returns a pytree of NamedShardings matching ``params``.
    """
    repl = NamedSharding(mesh, P())

    def block_rule(bp: dict) -> dict:
        out = {}
        for name, p in bp.items():
            rules = {}
            for k, v in p.items():
                nd = np.ndim(v)
                if name in ("conv", "cond_c", "cond_g"):
                    # column-parallel: output (gate) axis sharded
                    if k in ("v", "w"):
                        rules[k] = NamedSharding(
                            mesh, P(*([None] * (nd - 1) + [axis])))
                    else:  # g, b are per-output-channel
                        rules[k] = NamedSharding(mesh, P(axis))
                elif name in ("skip", "out"):
                    # row-parallel: input (gate/2) axis sharded
                    if k in ("v", "w"):
                        rules[k] = NamedSharding(
                            mesh, P(*([None] * (nd - 2) + [axis, None])))
                    elif k == "g":
                        rules[k] = repl  # norm over sharded input -> keep g whole
                    else:
                        rules[k] = repl
                else:
                    rules[k] = repl
            out[name] = rules
        return out

    shardings: dict = {}
    for key, val in params.items():
        if key == "blocks":
            shardings[key] = [block_rule(bp) for bp in val]
        else:
            shardings[key] = jax.tree.map(lambda _: repl, val)
    return shardings


def shard_params_tp(params: Any, mesh: Mesh, axis: str = "model") -> Any:
    """Place params with tensor-parallel shardings (see
    :func:`wavenet_param_shardings`)."""
    return jax.device_put(params, wavenet_param_shardings(params, mesh, axis))
