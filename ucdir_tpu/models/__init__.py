"""Flax network definitions (NHWC, TPU-native layouts).

Components mirror /root/reference/model/ucdir.py:
  * `UNetSeeInDark` — the guidance predictor (ucdir.py:310-416)
  * `DY3h` — the diffusion denoiser UNet with AKGM blocks (ucdir.py:204-307)
  * building blocks in `layers` / `akgm` / `attention`.
"""
from ucdir_tpu.models.layers import (PositionalEncoding, FeatureWiseAffine,
                                     Block, ResnetBlock, Upsample, Downsample,
                                     swish, simple_gate)
from ucdir_tpu.models.akgm import ResnetBlockDY3h
from ucdir_tpu.models.attention import SelfAttention
from ucdir_tpu.models.dy3h import DY3h, ResnetBlocWithAttn
from ucdir_tpu.models.seeindark import UNetSeeInDark
from ucdir_tpu.models.factory import define_G
