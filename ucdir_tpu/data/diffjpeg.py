"""Differentiable JPEG in JAX.

Parity target: /root/reference/data/diffjpeg.py:14-491 (the DiffJPEG port with
non-/8-divisible handling): RGB->YCbCr, 2x chroma subsample, 8x8 block split,
DCT, y/c quantization with the standard JPEG tables scaled by the
quality->factor mapping, differentiable (or hard) rounding, dequantize, iDCT,
merge, chroma upsample, YCbCr->RGB, pad-to-16 wrapper.

TPU-native: the 8x8 DCT/iDCT are expressed as two small matmuls
(M^T B M with the cosine basis) batched over all blocks — MXU work — instead
of the reference's rank-4 tensordot; arithmetic is identical (verified against
the torch implementation in tests/test_diffjpeg.py).

All functions are jit-safe; `quality` may be a scalar or a per-sample (b,)
array. Images are NHWC RGB in [0, 1].
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# standard JPEG luma/chroma quantization tables (stored transposed like the
# reference so the same (x, y)-indexed block math applies)
Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101], [72, 92, 95, 98, 112, 100, 103, 99]],
    dtype=np.float32).T
C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]],
                           dtype=np.float32).T

# cosine basis M[x, u] = cos((2x+1) u pi / 16); DCT = scale * (M^T B M)
_M = np.array([[np.cos((2 * x + 1) * u * np.pi / 16) for u in range(8)]
               for x in range(8)], dtype=np.float32)
_ALPHA = np.outer(np.array([1. / np.sqrt(2)] + [1] * 7),
                  np.array([1. / np.sqrt(2)] + [1] * 7)).astype(np.float32)


def diff_round(x):
    return jnp.round(x) + (x - jnp.round(x)) ** 3


def quality_to_factor(quality):
    quality = jnp.asarray(quality, jnp.float32)
    return jnp.where(quality < 50, 5000. / quality, 200. - quality * 2) / 100.


def rgb_to_ycbcr_jpeg(image):
    """NHWC RGB [0,255] -> NHWC YCbCr (full range, JPEG convention)."""
    matrix = jnp.asarray(
        [[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5],
         [0.5, -0.418688, -0.081312]], jnp.float32).T
    shift = jnp.asarray([0., 128., 128.], jnp.float32)
    return image @ matrix + shift


def ycbcr_to_rgb_jpeg(image):
    matrix = jnp.asarray(
        [[1., 0., 1.402], [1., -0.344136, -0.714136], [1., 1.772, 0.]],
        jnp.float32).T
    shift = jnp.asarray([0., -128., -128.], jnp.float32)
    return (image + shift) @ matrix


def chroma_subsample(ycbcr):
    """(b,h,w,3) -> y (b,h,w), cb/cr (b,h/2,w/2) via 2x2 mean."""
    y = ycbcr[..., 0]
    b, h, w, _ = ycbcr.shape
    c = ycbcr[..., 1:].reshape(b, h // 2, 2, w // 2, 2, 2)
    c = c.mean(axis=(2, 4))
    return y, c[..., 0], c[..., 1]


def chroma_upsample(y, cb, cr, k: int = 2):
    """Reference's repeat-based 2x upsample (diffjpeg.py:366-375) — bit-exact
    replication of the tile/view arrangement."""
    def rep(x):
        b, h, w = x.shape
        x = jnp.tile(x[..., None], (1, 1, k, k))
        return x.reshape(b, h * k, w * k)
    return jnp.stack([y, rep(cb), rep(cr)], axis=-1)


def block_split(x, k: int = 8):
    """(b,h,w) -> (b, h/k * w/k, k, k) in the reference's block order."""
    b, h, w = x.shape
    x = x.reshape(b, h // k, k, w // k, k)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, k, k)


def block_merge(patches, height: int, width: int, k: int = 8):
    b = patches.shape[0]
    x = patches.reshape(b, height // k, width // k, k, k)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, height, width)


def dct8x8(blocks):
    """(b,n,8,8) spatial -> frequency; scale * (M^T (B-128) M)."""
    M = jnp.asarray(_M)
    scale = jnp.asarray(_ALPHA * 0.25)
    x = blocks - 128.
    return scale * jnp.einsum('bnxy,xu,yv->bnuv', x, M, M,
                              preferred_element_type=jnp.float32)


def idct8x8(blocks):
    M = jnp.asarray(_M)
    x = blocks * jnp.asarray(_ALPHA)
    return 0.25 * jnp.einsum('bnuv,xu,yv->bnxy', x, M, M,
                             preferred_element_type=jnp.float32) + 128.


def _factor_table(table, factor, b):
    table = jnp.asarray(table)
    factor = jnp.asarray(factor, jnp.float32)
    if factor.ndim == 0:
        return table * factor
    return table[None, None] * factor.reshape(b, 1, 1, 1)


def compress_jpeg(image, factor, rounding):
    """image: NHWC RGB [0,1] (dims /16). Returns quantized (y, cb, cr)."""
    b = image.shape[0]
    y, cb, cr = chroma_subsample(rgb_to_ycbcr_jpeg(image * 255.))
    out = []
    for comp, table in ((y, Y_TABLE), (cb, C_TABLE), (cr, C_TABLE)):
        blocks = dct8x8(block_split(comp))
        out.append(rounding(blocks / _factor_table(table, factor, b)))
    return tuple(out)


def decompress_jpeg(y, cb, cr, imgh: int, imgw: int, factor):
    b = y.shape[0]
    comps = []
    for comp, table, (hh, ww) in (
            (y, Y_TABLE, (imgh, imgw)),
            (cb, C_TABLE, (imgh // 2, imgw // 2)),
            (cr, C_TABLE, (imgh // 2, imgw // 2))):
        deq = comp * _factor_table(table, factor, b)
        comps.append(block_merge(idct8x8(deq), hh, ww))
    image = ycbcr_to_rgb_jpeg(chroma_upsample(*comps))
    return jnp.clip(image, 0., 255.) / 255.


def diff_jpeg(x, quality, differentiable: bool = True):
    """Full JPEG round-trip. x: NHWC RGB [0,1]; quality scalar or (b,).

    Mirrors DiffJPEG.forward (diffjpeg.py:467-491) incl. the zero pad-to-16.
    """
    rounding = diff_round if differentiable else jnp.round
    factor = quality_to_factor(quality)
    b, h, w, _ = x.shape
    h_pad = (16 - h % 16) % 16
    w_pad = (16 - w % 16) % 16
    x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    y, cb, cr = compress_jpeg(x, factor, rounding)
    rec = decompress_jpeg(y, cb, cr, h + h_pad, w + w_pad, factor)
    return rec[:, :h, :w, :]


class DiffJPEG:
    """Callable wrapper matching the reference module API."""

    def __init__(self, differentiable: bool = True):
        self.differentiable = differentiable

    def __call__(self, x, quality):
        return diff_jpeg(x, quality, differentiable=self.differentiable)
