"""ucdir_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
zhangyi-3/UCDIR ("A Unified Conditional Framework for Diffusion-based Image
Restoration", arXiv:2305.20049).

Design (TPU-first, not a port):
  * NHWC layout everywhere; convs hit the MXU via XLA:TPU.
  * Diffusion sampling is a single `lax.scan` compiled end-to-end (the reference
    runs a host-side Python loop with a host->device transfer per step,
    /root/reference/model/diffusion.py:162,193).
  * Data parallelism via `jax.sharding.Mesh` + jit shardings (the reference uses
    one-process-per-GPU NCCL DDP, /root/reference/model/model.py:43).
  * High-resolution images are handled by a sharded tiled sampler
    (`ucdir_tpu.parallel.tiled`) replacing the sequential patch loop
    (/root/reference/utils/util.py:108-146).
  * The AKGM hot op has a fused Pallas kernel (`ucdir_tpu.ops`) avoiding the
    8x activation blow-up of the grouped-conv trick
    (/root/reference/model/ucdir.py:132-137).
"""

__version__ = "0.1.0"
