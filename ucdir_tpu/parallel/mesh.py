"""Mesh construction + sharding helpers.

The reference's only parallelism is NCCL data-parallel DDP
(/root/reference/model/model.py:43-44, utils/dist_utils.py). TPU-native
equivalent: a 1-D (or 2-D data x tile) `jax.sharding.Mesh`; gradient
all-reduce is implicit in jit's partitioning, riding ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis_names: Sequence[str] = ('data',),
              shape: Optional[Sequence[int]] = None) -> Mesh:
    """Build a mesh over the first `n_devices` devices.

    axis_names=('data',) for pure DP; ('data', 'tile') with a 2-D shape for the
    tiled high-res sampler (tiles sharded over the 'tile' axis).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (n_devices,) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: str = 'data') -> NamedSharding:
    """Batch-dim sharding for NHWC tensors (and pytrees thereof)."""
    return NamedSharding(mesh, P(axis))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
