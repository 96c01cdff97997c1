"""Device prefetchers.

Parity target: /root/reference/data/prefetcher.py (187 LoC; CPU/CUDA
prefetchers with a side CUDA stream — dormant in the reference's live path).
TPU-native equivalent: overlap host batch assembly with device compute by
eagerly `jax.device_put`-ing the next batch (optionally with shardings) while
the current step runs; JAX's async dispatch provides the overlap.
"""
from __future__ import annotations

from typing import Any, Dict, Iterator, Optional

import jax


class DevicePrefetcher:
    """Wrap a host batch iterator; keeps `depth` batches in flight on device.

    sharding: optional jax.sharding.Sharding (or pytree of) applied via
    device_put — e.g. NamedSharding(mesh, P('data')) for data-parallel input.
    """

    def __init__(self, loader, sharding: Optional[Any] = None,
                 depth: int = 2):
        self.loader = loader
        self.sharding = sharding
        self.depth = max(1, depth)

    def set_epoch(self, epoch: int):
        if hasattr(self.loader, 'set_epoch'):
            self.loader.set_epoch(epoch)

    def __len__(self):
        return len(self.loader)

    def _put(self, batch: Dict[str, Any]):
        if self.sharding is None:
            return jax.device_put(batch)
        return jax.device_put(batch, self.sharding)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        it = iter(self.loader)
        queue = []
        try:
            for _ in range(self.depth):
                queue.append(self._put(next(it)))
        except StopIteration:
            pass
        while queue:
            out = queue.pop(0)
            try:
                queue.append(self._put(next(it)))
            except StopIteration:
                pass
            yield out


class CPUPrefetcher:
    """Alias of the threaded host loader pipeline (the DataLoader already
    prefetches batches with a thread pool); kept for API parity."""

    def __init__(self, loader):
        self.loader = loader

    def __iter__(self):
        return iter(self.loader)

    def __len__(self):
        return len(self.loader)
