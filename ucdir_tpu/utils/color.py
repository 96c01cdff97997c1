"""Color-space conversions in JAX (sRGB/linear, XYZ, Lab, YUV).

Parity target: /root/reference/utils/color.py:4-289 (torch conversions; unused
by the live path but part of the utility surface). Inputs are (..., 3) arrays;
RGB in [0, 1] unless noted. Standard D65 / BT.601 constants.
"""
from __future__ import annotations

import jax.numpy as jnp

_XYZ_FROM_RGB = jnp.asarray([[0.412453, 0.357580, 0.180423],
                             [0.212671, 0.715160, 0.072169],
                             [0.019334, 0.119193, 0.950227]])
_RGB_FROM_XYZ = jnp.asarray([[3.240479, -1.537150, -0.498535],
                             [-0.969256, 1.875991, 0.041556],
                             [0.055648, -0.204043, 1.057311]])
_D65 = jnp.asarray([0.950456, 1.0, 1.088754])

_YUV_FROM_RGB = jnp.asarray([[0.299, 0.587, 0.114],
                             [-0.14713, -0.28886, 0.436],
                             [0.615, -0.51499, -0.10001]])
_RGB_FROM_YUV = jnp.asarray([[1.0, 0.0, 1.13983],
                             [1.0, -0.39465, -0.58060],
                             [1.0, 2.03211, 0.0]])


def srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def linear_to_srgb(x):
    x = jnp.clip(x, 0., None)
    return jnp.where(x <= 0.0031308, x * 12.92,
                     1.055 * x ** (1 / 2.4) - 0.055)


def rgb_to_xyz(rgb):
    return rgb @ _XYZ_FROM_RGB.T


def xyz_to_rgb(xyz):
    return xyz @ _RGB_FROM_XYZ.T


def _lab_f(t):
    d = 6. / 29.
    return jnp.where(t > d ** 3, jnp.cbrt(t), t / (3 * d * d) + 4. / 29.)


def _lab_finv(t):
    d = 6. / 29.
    return jnp.where(t > d, t ** 3, 3 * d * d * (t - 4. / 29.))


def xyz_to_lab(xyz):
    x, y, z = [xyz[..., i] / _D65[i] for i in range(3)]
    fx, fy, fz = _lab_f(x), _lab_f(y), _lab_f(z)
    L = 116. * fy - 16.
    a = 500. * (fx - fy)
    b = 200. * (fy - fz)
    return jnp.stack([L, a, b], axis=-1)


def lab_to_xyz(lab):
    L, a, b = lab[..., 0], lab[..., 1], lab[..., 2]
    fy = (L + 16.) / 116.
    fx = fy + a / 500.
    fz = fy - b / 200.
    xyz = jnp.stack([_lab_finv(fx), _lab_finv(fy), _lab_finv(fz)], axis=-1)
    return xyz * _D65


def rgb_to_lab(rgb):
    return xyz_to_lab(rgb_to_xyz(srgb_to_linear(rgb)))


def lab_to_rgb(lab):
    return linear_to_srgb(xyz_to_rgb(lab_to_xyz(lab)))


def rgb_to_yuv(rgb):
    return rgb @ _YUV_FROM_RGB.T


def yuv_to_rgb(yuv):
    return yuv @ _RGB_FROM_YUV.T
