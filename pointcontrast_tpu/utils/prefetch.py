"""Device prefetch: overlap host->device batch transfer with the running
step.

The torch reference overlaps H2D with pinned-memory DataLoader workers; the
JAX equivalent is to ``jax.device_put`` the NEXT batch while the current
step executes (dispatch is async, so the copy streams during compute).
"""
from __future__ import annotations

from typing import Iterator


def device_prefetch(loader, size: int = 2) -> Iterator:
    """Wrap an iterator of host batches; yields device-resident batches."""
    import collections

    import jax

    queue: collections.deque = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch = next(loader)
            except StopIteration:
                return
            queue.append(jax.device_put(batch))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
