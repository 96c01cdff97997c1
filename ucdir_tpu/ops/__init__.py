"""Hot ops: fused AKGM mix (Pallas + XLA reference), resize/pad helpers."""
from ucdir_tpu.ops.akgm import akgm_mix, akgm_mix_reference
