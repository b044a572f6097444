"""Device prefetch: overlap host->device batch transfer with the running
step.

The torch reference overlaps H2D with pinned-memory DataLoader workers; the
JAX equivalent is to ``jax.device_put`` the NEXT batch while the current
step executes (dispatch is async, so the copy streams during compute).
"""
from __future__ import annotations

from typing import Iterator


def device_prefetch(loader, size: int = 2, sharding=None) -> Iterator:
    """Wrap an iterator of host batches; yields device-resident batches.

    Pass the mesh sharding for data-parallel batches (leading device axis)
    so arrays land directly in their shards — a bare device_put would commit
    everything to device 0 and force a reshard inside the jitted step."""
    import collections

    import jax

    queue: collections.deque = collections.deque()

    def put(batch):
        if sharding is None:
            return jax.device_put(batch)
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding)
            if hasattr(x, "ndim") and x.ndim >= 1 else x,
            batch,
        )

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(loader)
            except StopIteration:
                return
            queue.append(put(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
