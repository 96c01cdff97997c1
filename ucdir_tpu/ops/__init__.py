"""Hot ops: fused AKGM mix (Pallas + XLA reference), resize/pad helpers."""
from ucdir_tpu.ops.akgm import akgm_mix, akgm_mix_reference

import os as _os


def vmem_limit_bytes() -> int:
    """Per-kernel Mosaic VMEM budget. Default 100 MB (the pallas default OOMs
    inside big XLA programs, CLAUDE.md r2); UCDIR_TPU_VMEM_MB overrides for
    in-model pressure experiments (a lower budget can let XLA overlap
    neighboring ops)."""
    return int(_os.environ.get('UCDIR_TPU_VMEM_MB', '100')) * 1024 * 1024


def chain_stats_mode() -> str:
    """Producer-emitted GroupNorm(1) stats chaining (read at trace time):
      'auto' (default) — fused kernels emit their output's (B,) sum/sumsq so
          the next block's folded norm never re-reads the tensor from HBM;
      'xla'  — emit via plain XLA sums even off-TPU (exercises the model's
          stats-threading algebra in CPU tests);
      '0'    — never emit (consumers fall back to ops/stats_pallas.gn1_stats).
    """
    return _os.environ.get('UCDIR_TPU_CHAIN_STATS', 'auto')
