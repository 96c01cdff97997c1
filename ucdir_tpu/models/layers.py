"""Shared building blocks (NHWC).

Parity targets in /root/reference/model/ucdir.py:
  PositionalEncoding      ucdir.py:19-29   (WaveGrad continuous-noise-level encoding)
  FeatureWiseAffine       ucdir.py:32-45
  Swish / SimpleGate      ucdir.py:48-50,143-152
  Upsample / Downsample   ucdir.py:53-69
  Block / ResnetBlock     ucdir.py:75-100

All convs are `flax.linen.Conv` (NHWC x HWIO) so XLA:TPU maps them straight
onto the MXU. Reflect padding helpers reproduce torch.nn.functional.pad
semantics used throughout the reference.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def swish(x):
    return x * jax.nn.sigmoid(x)


def simple_gate(x, axis=-1):
    x1, x2 = jnp.split(x, 2, axis=axis)
    return x1 * x2


def reflect_pad_hw(x, pad_h, pad_w):
    """Reflect-pad the two spatial dims of an NHWC tensor.
    torch F.pad(x, (l, r, t, b), mode='reflect') equivalent with independent
    left/right/top/bottom amounts given as tuples."""
    (t, b), (l, r) = pad_h, pad_w
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode='reflect')


def pad_to_multiple(x, fac: int, strict_extra: bool = True):
    """Reflect-pad bottom/right so H, W become multiples of `fac`.

    The reference computes pad = (h//fac + 1)*fac - h (ucdir.py:303-307), which
    always adds at least 1 pixel (a full `fac` if already divisible) and crops
    with [..., :-padh, :-padw]. `strict_extra=True` reproduces that exactly so
    converted checkpoints are bit-comparable.
    """
    h, w = x.shape[1], x.shape[2]
    if strict_extra:
        padh, padw = (h // fac + 1) * fac - h, (w // fac + 1) * fac - w
    else:
        padh, padw = (-h) % fac, (-w) % fac
    if padh or padw:
        x = jnp.pad(x, ((0, 0), (0, padh), (0, padw), (0, 0)), mode='reflect')
    return x, (padh, padw)


def crop_pad(y, pads):
    padh, padw = pads
    if padh:
        y = y[:, :-padh]
    if padw:
        y = y[:, :, :-padw]
    return y


class PositionalEncoding(nn.Module):
    """Sinusoidal encoding of the continuous noise level (not integer t)."""
    dim: int

    @nn.compact
    def __call__(self, noise_level):
        # noise_level: (b,) or (b,1) — the continuous sqrt(alpha_cumprod).
        noise_level = noise_level.reshape(noise_level.shape[0])
        count = self.dim // 2
        step = jnp.arange(count, dtype=noise_level.dtype) / count
        enc = noise_level[:, None] * jnp.exp(-math.log(1e4) * step[None, :])
        return jnp.concatenate([jnp.sin(enc), jnp.cos(enc)], axis=-1)


class FeatureWiseAffine(nn.Module):
    out_channels: int
    use_affine_level: bool = False

    @nn.compact
    def __call__(self, x, noise_embed):
        h = nn.Dense(self.out_channels * (1 + self.use_affine_level),
                     name='noise_func')(noise_embed)
        h = h[:, None, None, :]
        if self.use_affine_level:
            gamma, beta = jnp.split(h, 2, axis=-1)
            return (1 + gamma) * x + beta
        return x + h


class PallasConv3(nn.Module):
    """Drop-in 3x3 SAME conv (param tree identical to nn.Conv: kernel/bias)
    that dispatches to the fused Pallas TPU kernel at the big scales where
    XLA's conv emitter runs at 6-35% MXU (ops/conv_pallas.py). `act='swish'`
    fuses the following activation into the kernel epilogue."""
    features: int
    act: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, norm_scale=None, norm_shift=None,
                 emit_stats: bool = False):
        from ucdir_tpu.ops.conv_pallas import conv3x3
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return conv3x3(x, kernel, bias, act=self.act,
                       use_pallas=self.use_pallas,
                       norm_scale=norm_scale, norm_shift=norm_shift,
                       emit_stats=emit_stats)


class PallasConv1(nn.Module):
    """Drop-in 1x1 conv (param tree identical to nn.Conv) with the Pallas
    per-pixel-matmul path at the big scales (ops/conv_pallas.conv1x1)."""
    features: int
    act: Optional[str] = None
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        from ucdir_tpu.ops.conv_pallas import conv1x1
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (1, 1, x.shape[-1], self.features))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        return conv1x1(x, kernel, bias, act=self.act,
                       use_pallas=self.use_pallas)


class Upsample(nn.Module):
    """nearest x2 + conv3 (ucdir.py:53-60), computed as ONE phase-packed
    conv at SOURCE resolution + depth-to-space (ops/conv_pallas.upconv2x):
    exact, 2x fewer MXU FLOPs, and the 2x-upsampled map never hits HBM."""
    dim: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, emit_stats: bool = False):
        from ucdir_tpu.ops.conv_pallas import upconv2x
        k, b = _Conv3Params(x.shape[-1], self.dim, name='conv')()
        return upconv2x(x, k, b, use_pallas=self.use_pallas,
                        emit_stats=emit_stats)


class _Conv3Params(nn.Module):
    """nn.Conv-shaped parameter tree (kernel/bias) without the conv itself —
    keeps Upsample's checkpoint layout identical while the computation runs
    through the phase-packed upconv2x."""
    cin: int
    cout: int

    @nn.compact
    def __call__(self):
        kernel = self.param('kernel', nn.initializers.lecun_normal(),
                            (3, 3, self.cin, self.cout))
        bias = self.param('bias', nn.initializers.zeros, (self.cout,))
        return kernel, bias


class Downsample(nn.Module):
    """stride-2 conv3 (ucdir.py:63-69), via the half-width stride-2
    x-im2col Pallas kernel at the big scales (ops/conv_pallas.downconv2x)."""
    dim: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, emit_stats: bool = False):
        from ucdir_tpu.ops.conv_pallas import downconv2x
        k, b = _Conv3Params(x.shape[-1], self.dim, name='conv')()
        return downconv2x(x, k, b, use_pallas=self.use_pallas,
                          emit_stats=emit_stats)


class Block(nn.Module):
    """GroupNorm -> Swish -> Dropout -> Conv3 (ucdir.py:75-83)."""
    dim_out: int
    groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from ucdir_tpu.ops.gn_scope import gn_tile_window, tile_gn
        win = (gn_tile_window(x.shape[1], x.shape[2])
               if self.groups == 1 else None)
        if win is not None:    # UCDIR_TPU_GN_SCOPE=tile (ops/gn_scope.py)
            from ucdir_tpu.models.akgm import _NormParams
            x = tile_gn(x, *_NormParams(x.shape[-1], name='norm')(), win)
        else:
            x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                             name='norm')(x)
        x = swish(x)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=deterministic)(x)
        return nn.Conv(self.dim_out, (3, 3), padding=1, name='conv')(x)


class ResnetBlock(nn.Module):
    """Classic SR3 residual block (ucdir.py:86-100); selectable via resname."""
    dim: int
    dim_out: int
    nl_emb_dim: Optional[int] = None
    dropout: float = 0.0
    use_affine_level: bool = False
    norm_groups: int = 32

    @nn.compact
    def __call__(self, x, time_emb, deterministic: bool = True):
        h = Block(self.dim_out, groups=self.norm_groups, name='block1')(x)
        h = FeatureWiseAffine(self.dim_out, self.use_affine_level,
                              name='noise_func')(h, time_emb)
        h = Block(self.dim_out, groups=self.norm_groups, dropout=self.dropout,
                  name='block2')(h, deterministic=deterministic)
        if self.dim != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), name='res_conv')(x)
        else:
            res = x
        return h + res
