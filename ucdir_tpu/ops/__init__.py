"""Hot ops: fused AKGM mix (Pallas + XLA reference), resize/pad helpers."""
from ucdir_tpu.ops.akgm import akgm_mix, akgm_mix_reference

import os as _os


def vmem_limit_bytes() -> int:
    """Per-kernel Mosaic VMEM budget. Default 100 MB (the pallas default OOMs
    inside big XLA programs, CLAUDE.md r2); UCDIR_TPU_VMEM_MB overrides for
    in-model pressure experiments (a lower budget can let XLA overlap
    neighboring ops)."""
    return int(_os.environ.get('UCDIR_TPU_VMEM_MB', '100')) * 1024 * 1024
