"""Multi-host (multi-process) bring-up — DCN across hosts.

The reference's only training parallelism is single-host multi-GPU
DataParallel (reference: train.py:676-689). The TPU-native equivalent
(SURVEY.md sections 2.4, 5.8) is one JAX process per host joining a cluster:
``jax.distributed.initialize`` wires the processes together, the Mesh then
spans EVERY host's devices, and the exact same jitted train step runs SPMD —
XLA routes the gradient psum over ICI within a slice and DCN between hosts.

Data feeding: each process loads only its slice of the corpus
(``WaveNetDataset.shard``-style striding) and materializes its LOCAL batch
rows; :func:`global_batch_from_local` assembles the global sharded
``jax.Array`` (global batch = num_processes x local batch) without any
cross-host copy of sample data. Replicated leaves (params, optimizer state,
scalars) are built identically on every process and stamped with a
replicated sharding via the same process-local constructor.

Tested with 2 CPU processes on localhost (tests/test_distributed.py) — the
same code path brings up TPU pods, where ``jax.distributed.initialize()``
autodetects coordinator/process-count from the TPU metadata.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None,
                           local_device_ids: Optional[str] = None
                           ) -> Tuple[int, int]:
    """Join (or auto-detect) the multi-process cluster.

    On TPU pods ``jax.distributed.initialize()`` with no arguments
    autodetects everything from the TPU metadata server; elsewhere (CPU
    fleets, tests) pass coordinator_address ("host:port"), num_processes and
    process_id explicitly. Returns (process_index, process_count).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids:
        kwargs["local_device_ids"] = [
            int(d) for d in str(local_device_ids).split(",")]
    jax.distributed.initialize(**kwargs)
    return jax.process_index(), jax.process_count()


def process_info() -> Tuple[int, int]:
    return jax.process_index(), jax.process_count()


def is_primary() -> bool:
    """True on the process that should write checkpoints/metrics/artifacts."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """Per-process batch rows (the reference hard-errors on
    batch % num_gpu != 0, README.md:176 — same constraint across hosts)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes")
    return global_batch_size // n


def global_batch_from_local(local_batch: Any, mesh: Mesh,
                            axis: str = "data") -> Any:
    """Per-process local batch rows -> one GLOBAL jax.Array batch sharded
    over ``axis``. Each process contributes exactly its addressable shards;
    no sample data crosses hosts. Scalars/0-d leaves replicate (every
    process must pass identical values)."""
    def put(x):
        if x is None:
            return None
        x = np.asarray(x) if not isinstance(x, jax.Array) else x
        if x.ndim == 0:
            spec = P()
        else:
            spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), np.asarray(x))
    return jax.tree.map(put, local_batch, is_leaf=lambda x: x is None)


def replicate_global(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree on a (possibly multi-host) mesh. Every process must
    hold the SAME values (e.g. params built from the same PRNGKey) — each
    supplies the full array as its process-local data."""
    sharding = NamedSharding(mesh, P())

    def put(x):
        if x is None:
            return None
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(jax.device_get(x)))
    return jax.tree.map(put, tree, is_leaf=lambda x: x is None)
