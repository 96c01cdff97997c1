"""Test harness: run everything on a virtual 8-device CPU mesh so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4)."""
import os
import sys

# repo root must precede the reference checkout on sys.path (parity tests
# add /root/reference, whose top-level sr.py/eval1.py collide with ours)
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT in sys.path:
    sys.path.remove(_ROOT)
sys.path.insert(0, _ROOT)

# Force CPU (the shell presets JAX_PLATFORMS=axon — the real-TPU tunnel).
# jax is already imported by the jaxtyping pytest plugin at this point, so the
# env var alone is too late — jax captured it at import. Update the config
# directly; the backend itself is initialized lazily, so this still works.
# Opt-out: UCDIR_TPU_HW=1 keeps the real backend so the hardware-marked tests
# (tests/test_tpu_hw.py) run on the actual chip.
import jax

if os.environ.get("UCDIR_TPU_HW") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    jax.config.update("jax_platforms", "cpu")

# XLA:CPU (LLVM) compiles are slow in this image — cache them across test runs.
jax.config.update('jax_compilation_cache_dir', '/root/.cache/jax_comp_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
