"""Distributed-runtime helpers.

Parity target: /root/reference/utils/dist_utils.py:10-79 (`init_dist`,
`get_dist_info`, `master_only`). The NCCL/slurm process-group machinery maps
to `jax.distributed.initialize()` (one call per host; device mesh + jit
shardings replace explicit collectives — SURVEY.md §2.7).
"""
from __future__ import annotations

import functools
import os
from typing import Tuple


def init_dist(launcher: str = 'jax', **kwargs) -> None:
    """Initialize multi-host JAX. Accepts the reference's launcher names
    ('pytorch'/'slurm') for CLI compatibility — both resolve to
    jax.distributed.initialize, which reads coordinator/process env vars
    (or slurm variables) automatically."""
    import jax
    try:
        jax.distributed.initialize(**kwargs)
    except Exception:
        # single-process fallback, mirroring the reference's tolerance of
        # uninitialized process groups (dist_utils.py:58-69)
        pass


def get_dist_info() -> Tuple[int, int]:
    """(rank, world_size); (0, 1) when uninitialized."""
    try:
        import jax
        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


def master_only(func):
    """Run only on process 0 (reference dist_utils.py:72-79)."""

    @functools.wraps(func)
    def wrapper(*args, **kwargs):
        rank, _ = get_dist_info()
        if rank == 0:
            return func(*args, **kwargs)

    return wrapper
