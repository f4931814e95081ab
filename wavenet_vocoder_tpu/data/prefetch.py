"""Device prefetch: overlap host collate + H2D transfer with device compute.

The reference's input pipeline blocks the train step on torch DataLoader
worker output + a synchronous ``.to(device)`` (reference: train.py:698-733);
here JAX's async dispatch lets us ``device_put`` the NEXT batch while the
current step executes — the transfer rides in the gaps.
"""
from __future__ import annotations

from collections import deque
from typing import Any, Callable, Iterable, Iterator, Optional

import jax


def prefetch_to_device(iterator: Iterable, *, depth: int = 2,
                       put: Optional[Callable[[Any], Any]] = None
                       ) -> Iterator:
    """Yield batches from ``iterator`` with ``depth`` batches already
    device_put ahead of consumption.

    ``put`` customizes placement (e.g. ``lambda b: shard_batch(b, mesh)``
    for multi-chip data parallelism); defaults to ``jax.device_put``.
    """
    put = put or jax.device_put
    q: deque = deque()
    it = iter(iterator)
    try:
        while len(q) < depth:
            q.append(put(next(it)))
    except StopIteration:
        pass
    while q:
        batch = q.popleft()
        try:
            q.append(put(next(it)))
        except StopIteration:
            pass
        yield batch
