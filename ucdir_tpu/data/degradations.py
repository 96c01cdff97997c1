"""Degradation synthesis: blur kernels, noise, JPEG.

Parity target: /root/reference/data/degradations.py (1030 LoC). Split by
execution site, mirroring the reference's numpy/_pt split:

  * HOST (numpy, per-item in dataset workers): kernel generators
    (bivariate iso/aniso/generalized/plateau Gaussians :98-523, sinc
    :529-549), numpy noise (:559-872 numpy halves), cv2 JPEG (:994-1030).
  * DEVICE (JAX, batched, jit-friendly, explicit PRNG keys): filter2D (:13-37),
    USMSharp (:69-89), batched gaussian/poisson noise (the `_pt` functions
    :600-872), torch-style resize. These compose into the jitted realsr
    feed_data pipeline (ucdir_tpu/realsr.py).

Jit note: the reference's per-sample `len(torch.unique(img))` in poisson noise
(:783-796) is data-dependent; here it is a 256-bin histogram count (images are
rounded to 255 levels first, so the two are identical) — static shapes.

Resize note: 'bicubic' uses jax.image.resize's Keys cubic (a=-0.5) vs torch's
a=-0.75 — a minor kernel-shape difference inside a randomized degradation
pipeline; 'area' is implemented with antialiased linear resize.
"""
from __future__ import annotations

import math
import random
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import special

# ===========================================================================
# HOST: blur kernel generation (numpy, matches reference math)
# ===========================================================================


def sigma_matrix2(sig_x, sig_y, theta):
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array([[np.cos(theta), -np.sin(theta)],
                  [np.sin(theta), np.cos(theta)]])
    return u @ d @ u.T


def mesh_grid(kernel_size):
    ax = np.arange(-kernel_size // 2 + 1., kernel_size // 2 + 1.)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.hstack((xx.reshape(-1, 1), yy.reshape(-1, 1))
                   ).reshape(kernel_size, kernel_size, 2)
    return xy, xx, yy


def pdf2(sigma_matrix, grid):
    inv = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.sum((grid @ inv) * grid, 2))


def bivariate_Gaussian(kernel_size, sig_x, sig_y, theta, grid=None,
                       isotropic=True):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    sm = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]]) if isotropic \
        else sigma_matrix2(sig_x, sig_y, theta)
    kernel = pdf2(sm, grid)
    return kernel / np.sum(kernel)


def bivariate_generalized_Gaussian(kernel_size, sig_x, sig_y, theta, beta,
                                   grid=None, isotropic=True):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    sm = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]]) if isotropic \
        else sigma_matrix2(sig_x, sig_y, theta)
    inv = np.linalg.inv(sm)
    kernel = np.exp(-0.5 * np.power(np.sum((grid @ inv) * grid, 2), beta))
    return kernel / np.sum(kernel)


def bivariate_plateau(kernel_size, sig_x, sig_y, theta, beta, grid=None,
                      isotropic=True):
    if grid is None:
        grid, _, _ = mesh_grid(kernel_size)
    sm = np.array([[sig_x ** 2, 0], [0, sig_x ** 2]]) if isotropic \
        else sigma_matrix2(sig_x, sig_y, theta)
    inv = np.linalg.inv(sm)
    kernel = np.reciprocal(np.power(np.sum((grid @ inv) * grid, 2), beta) + 1)
    return kernel / np.sum(kernel)


def _rand_sig_rot(sigma_x_range, sigma_y_range, rotation_range, isotropic):
    sigma_x = np.random.uniform(*sigma_x_range)
    if isotropic:
        return sigma_x, sigma_x, 0
    return (sigma_x, np.random.uniform(*sigma_y_range),
            np.random.uniform(*rotation_range))


def _rand_beta(beta_range):
    if np.random.uniform() < 0.5:
        return np.random.uniform(beta_range[0], 1)
    return np.random.uniform(1, beta_range[1])


def _mult_noise(kernel, noise_range):
    if noise_range is not None:
        kernel = kernel * np.random.uniform(*noise_range, size=kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_Gaussian(kernel_size, sigma_x_range, sigma_y_range,
                              rotation_range, noise_range=None, isotropic=True,
                              return_sigma=False):
    sx, sy, rot = _rand_sig_rot(sigma_x_range, sigma_y_range, rotation_range,
                                isotropic)
    kernel = _mult_noise(
        bivariate_Gaussian(kernel_size, sx, sy, rot, isotropic=isotropic),
        noise_range)
    return (kernel, [sx, sy]) if return_sigma else kernel


def random_bivariate_generalized_Gaussian(kernel_size, sigma_x_range,
                                          sigma_y_range, rotation_range,
                                          beta_range, noise_range=None,
                                          isotropic=True, return_sigma=False):
    sx, sy, rot = _rand_sig_rot(sigma_x_range, sigma_y_range, rotation_range,
                                isotropic)
    kernel = _mult_noise(
        bivariate_generalized_Gaussian(kernel_size, sx, sy, rot,
                                       _rand_beta(beta_range),
                                       isotropic=isotropic), noise_range)
    return (kernel, [sx, sy]) if return_sigma else kernel


def random_bivariate_plateau(kernel_size, sigma_x_range, sigma_y_range,
                             rotation_range, beta_range, noise_range=None,
                             isotropic=True, return_sigma=False):
    sx, sy, rot = _rand_sig_rot(sigma_x_range, sigma_y_range, rotation_range,
                                isotropic)
    kernel = _mult_noise(
        bivariate_plateau(kernel_size, sx, sy, rot, _rand_beta(beta_range),
                          isotropic=isotropic), noise_range)
    return (kernel, [sx, sy]) if return_sigma else kernel


def random_mixed_kernels(kernel_list, kernel_prob, kernel_size=21,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         betag_range=(0.5, 8), betap_range=(0.5, 8),
                         noise_range=None, return_sigma=False):
    kernel_type = random.choices(kernel_list, kernel_prob)[0]
    common = dict(noise_range=noise_range, return_sigma=return_sigma)
    if kernel_type == 'iso':
        return random_bivariate_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            isotropic=True, **common)
    if kernel_type == 'aniso':
        return random_bivariate_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            isotropic=False, **common)
    if kernel_type == 'generalized_iso':
        return random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, isotropic=True, **common)
    if kernel_type == 'generalized_aniso':
        return random_bivariate_generalized_Gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, isotropic=False, **common)
    if kernel_type == 'plateau_iso':
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, noise_range=None, isotropic=True,
            return_sigma=return_sigma)
    if kernel_type == 'plateau_aniso':
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, noise_range=None, isotropic=False,
            return_sigma=return_sigma)
    raise ValueError(kernel_type)


def circular_lowpass_kernel(cutoff, kernel_size, pad_to=0):
    """2-D sinc filter (reference :529-549)."""
    assert kernel_size % 2 == 1
    c = (kernel_size - 1) / 2
    with np.errstate(divide='ignore', invalid='ignore'):
        kernel = np.fromfunction(
            lambda x, y: cutoff * special.j1(
                cutoff * np.sqrt((x - c) ** 2 + (y - c) ** 2)) /
            (2 * np.pi * np.sqrt((x - c) ** 2 + (y - c) ** 2)),
            [kernel_size, kernel_size])
    kernel[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = \
        cutoff ** 2 / (4 * np.pi)
    kernel = kernel / np.sum(kernel)
    if pad_to > kernel_size:
        p = (pad_to - kernel_size) // 2
        kernel = np.pad(kernel, ((p, p), (p, p)))
    return kernel


# ===========================================================================
# HOST: numpy noise + JPEG
# ===========================================================================


def _apply_clip_rounds(out, clip, rounds, xp=np):
    if clip and rounds:
        return xp.clip((out * 255.0).round(), 0, 255) / 255.
    if clip:
        return xp.clip(out, 0, 1)
    if rounds:
        return (out * 255.0).round() / 255.
    return out


def generate_gaussian_noise(img, sigma=10, gray_noise=False):
    if gray_noise:
        noise = np.float32(np.random.randn(*img.shape[:2])) * sigma / 255.
        noise = np.repeat(noise[:, :, None], 3, axis=2)
    else:
        noise = np.float32(np.random.randn(*img.shape)) * sigma / 255.
    return noise


def add_gaussian_noise(img, sigma=10, clip=True, rounds=False,
                       gray_noise=False):
    return _apply_clip_rounds(img + generate_gaussian_noise(img, sigma,
                                                            gray_noise),
                              clip, rounds)


def random_add_gaussian_noise(img, sigma_range=(0, 1.0), gray_prob=0,
                              clip=True, rounds=False):
    sigma = np.random.uniform(*sigma_range)
    gray = np.random.uniform() < gray_prob
    return _apply_clip_rounds(
        img + generate_gaussian_noise(img, sigma, gray), clip, rounds)


def generate_poisson_noise(img, scale=1.0, gray_noise=False):
    if gray_noise:
        gray = img @ np.array([0.299, 0.587, 0.114], img.dtype)  # rgb luma
        base = gray
    else:
        base = img
    base = np.clip((base * 255.0).round(), 0, 255) / 255.
    vals = len(np.unique(base))
    vals = 2 ** np.ceil(np.log2(vals))
    out = np.float32(np.random.poisson(base * vals) / float(vals))
    noise = out - base
    if gray_noise:
        noise = np.repeat(noise[:, :, None], 3, axis=2)
    return noise * scale


def add_poisson_noise(img, scale=1.0, clip=True, rounds=False,
                      gray_noise=False):
    return _apply_clip_rounds(img + generate_poisson_noise(img, scale,
                                                           gray_noise),
                              clip, rounds)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0,
                             clip=True, rounds=False):
    scale = np.random.uniform(*scale_range)
    gray = np.random.uniform() < gray_prob
    return _apply_clip_rounds(
        img + generate_poisson_noise(img, scale, gray), clip, rounds)


def random_add_speckle_noise(img, speckle_std):
    """multiplicative speckle (reference :877-894): out = img + img*N(0,std)."""
    std = np.random.uniform(speckle_std[0], speckle_std[1]) \
        if isinstance(speckle_std, (tuple, list)) else speckle_std
    noise = np.random.normal(0, std / 255., img.shape).astype(np.float32)
    return np.clip(img + img * noise, 0, 1)


def random_add_saltpepper_noise(img, amount, svsp):
    """salt & pepper (reference :909-931): `amount` fraction flipped,
    `svsp` salt-vs-pepper ratio."""
    a = np.random.uniform(amount[0], amount[1]) \
        if isinstance(amount, (tuple, list)) else amount
    s = np.random.uniform(svsp[0], svsp[1]) \
        if isinstance(svsp, (tuple, list)) else svsp
    out = img.copy()
    flip = np.random.rand(*img.shape[:2])
    out[flip < a * s] = 1.
    out[(flip >= a * s) & (flip < a)] = 0.
    return np.clip(out, 0, 1)


def random_add_screen_noise(img, linewidth=(1, 3), space=(20, 60)):
    """CRT-style dark scanlines (reference :963-991 family)."""
    lw = np.random.randint(linewidth[0], linewidth[1] + 1)
    sp = np.random.randint(space[0], space[1] + 1)
    out = img.copy()
    h = img.shape[0]
    for y in range(0, h, sp):
        out[y:y + lw] *= np.random.uniform(0.5, 0.9)
    return np.clip(out, 0, 1)


def add_jpg_compression(img, quality=90):
    """cv2 JPEG round-trip on a [0,1] float image (reference :994-1012)."""
    import cv2
    img = np.clip(img, 0, 1)
    ok, enc = cv2.imencode('.jpg', (img * 255.).astype(np.uint8),
                           [int(cv2.IMWRITE_JPEG_QUALITY), int(quality)])
    return np.float32(cv2.imdecode(enc, 1)) / 255.


def random_add_jpg_compression(img, quality_range=(90, 100), return_q=False):
    q = np.random.uniform(*quality_range)
    out = add_jpg_compression(img, q)
    return (out, q) if return_q else out


# ===========================================================================
# DEVICE: batched JAX ops (NHWC, explicit PRNG keys)
# ===========================================================================


def filter2D(img, kernel):
    """Per-sample 2-D filtering (reference :13-37).

    img: (b, h, w, c); kernel: (b, k, k) or (1, k, k). Reflect padding, odd k.
    TPU mapping: expressed as a depthwise conv via vmap over batch so each
    sample's kernel stays a (k,k,1,1) HWIO depthwise filter.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError('Wrong kernel size')
    pad = k // 2
    img = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                  mode='reflect')

    def one(im, ker):
        c = im.shape[-1]
        w = jnp.tile(ker[:, :, None, None], (1, 1, 1, c))
        return lax.conv_general_dilated(
            im[None], w, (1, 1), 'VALID',
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'),
            feature_group_count=c)[0]

    if kernel.shape[0] == 1:
        return jax.vmap(lambda im: one(im, kernel[0]))(img)
    return jax.vmap(one)(img, kernel)


def gaussian_kernel_2d(radius: int, sigma: float = 0) -> np.ndarray:
    """cv2.getGaussianKernel outer product (sigma=0 -> cv2's auto sigma)."""
    if radius % 2 == 0:
        radius += 1
    if sigma <= 0:
        sigma = 0.3 * ((radius - 1) * 0.5 - 1) + 0.8
    x = np.arange(radius, dtype=np.float64) - (radius - 1) / 2
    k = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k = (k / k.sum()).astype(np.float32)
    return np.outer(k, k)


def usm_sharp(img, weight: float = 0.5, radius: int = 50, sigma: float = 0,
              threshold: float = 10):
    """Batched USM sharpening (reference USMSharp :69-89). img: (b,h,w,c)."""
    import jax.numpy as jnp
    kernel = jnp.asarray(gaussian_kernel_2d(radius, sigma))[None]
    blur = filter2D(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255 > threshold).astype(img.dtype)
    soft_mask = filter2D(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img


def _rgb_to_gray(img):
    import jax.numpy as jnp
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


def random_add_gaussian_noise_pt(key, img, sigma_range=(0, 1.0), gray_prob=0,
                                 clip=True, rounds=False):
    """Batched device gaussian noise (reference :685-702). img: (b,h,w,c)."""
    import jax
    import jax.numpy as jnp
    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    sigma = jax.random.uniform(k1, (b, 1, 1, 1), img.dtype,
                               sigma_range[0], sigma_range[1])
    gray = (jax.random.uniform(k2, (b, 1, 1, 1), img.dtype)
            < gray_prob).astype(img.dtype)
    noise = jax.random.normal(k3, img.shape, img.dtype) * sigma / 255.
    noise_g = jax.random.normal(k4, img.shape[:3] + (1,), img.dtype) \
        * sigma / 255.
    noise = noise * (1 - gray) + noise_g * gray
    return _apply_clip_rounds(img + noise, clip, rounds, xp=jnp)


def _unique_vals_pow2(img):
    """2^ceil(log2(#unique levels)) per sample, computed on 255-level-rounded
    images via a histogram (jit-safe equivalent of reference :783-796)."""
    import jax.numpy as jnp
    b = img.shape[0]
    levels = jnp.round(jnp.clip(img * 255., 0, 255)).astype(jnp.int32)
    flat = levels.reshape(b, -1)
    counts = jax.vmap(lambda f: jnp.bincount(f, length=256))(flat)
    nuniq = jnp.sum((counts > 0).astype(jnp.float32), axis=1)
    return 2.0 ** jnp.ceil(jnp.log2(nuniq))


def random_add_poisson_noise_pt(key, img, scale_range=(0, 1.0), gray_prob=0,
                                clip=True, rounds=False):
    """Batched device poisson noise (reference :855-872). img: (b,h,w,c)."""
    import jax.numpy as jnp
    b = img.shape[0]
    k1, k2, k3, k4 = jax.random.split(key, 4)
    scale = jax.random.uniform(k1, (b, 1, 1, 1), img.dtype,
                               scale_range[0], scale_range[1])
    gray = (jax.random.uniform(k2, (b, 1, 1, 1), img.dtype)
            < gray_prob).astype(img.dtype)

    def poisson_noise(k, x):
        xr = jnp.round(jnp.clip(x * 255., 0, 255)) / 255.
        vals = _unique_vals_pow2(xr).reshape(b, 1, 1, 1)
        out = jax.random.poisson(k, xr * vals).astype(x.dtype) / vals
        return out - xr

    noise = poisson_noise(k3, img)
    gray_img = jnp.broadcast_to(_rgb_to_gray(img), img.shape)
    noise_g = poisson_noise(k4, gray_img)
    noise = noise * (1 - gray) + noise_g * gray
    return _apply_clip_rounds(img + noise * scale, clip, rounds, xp=jnp)


def _resize_weights(n_in: int, n_out: int, mode: str,
                    scale: Optional[float] = None) -> np.ndarray:
    """(n_out, n_in) separable resize matrix matching torch F.interpolate
    semantics exactly: bilinear/bicubic with antialias=False (the torch
    default) and align_corners=False source mapping src=(i+0.5)*s-0.5 with
    edge-clamped taps; 'area' = adaptive average pooling (uniform box over
    [floor(i*s), ceil((i+1)*s))). The degradation pipeline must reproduce the
    torch distribution (ADVICE r1: antialiased resizes produced cleaner LQ
    images than the reference trains on)."""
    W = np.zeros((n_out, n_in), np.float32)
    if mode == 'area':
        s = n_in / n_out
        for i in range(n_out):
            lo = int(np.floor(i * s))
            hi = max(int(np.ceil((i + 1) * s)), lo + 1)
            W[i, lo:hi] = 1.0 / (hi - lo)
        return W
    # torch keeps the caller's scale_factor for coordinate mapping when one
    # was given (recompute_scale_factor=None default), n_in/n_out otherwise
    s = n_in / n_out if scale is None else 1.0 / scale
    src = (np.arange(n_out) + 0.5) * s - 0.5
    if mode == 'bilinear':
        # non-cubic kernels clamp negative source coords to 0
        # (aten area_pixel_compute_source_index)
        src = np.maximum(src, 0.)
    j0 = np.floor(src).astype(np.int64)
    frac = src - j0
    if mode == 'bilinear':
        taps = [(0, 1 - frac), (1, frac)]
    elif mode == 'bicubic':
        a = -0.75  # torch's cubic convolution coefficient

        def cub(d):
            d = np.abs(d)
            return np.where(
                d <= 1, ((a + 2) * d - (a + 3)) * d * d + 1,
                np.where(d < 2, a * (((d - 5) * d + 8) * d - 4), 0.))
        taps = [(k, cub(frac - k)) for k in (-1, 0, 1, 2)]
    else:
        raise NotImplementedError(mode)
    for k, wk in taps:
        idx = np.clip(j0 + k, 0, n_in - 1)
        np.add.at(W, (np.arange(n_out), idx), wk.astype(np.float32))
    return W


def interpolate(img, scale_factor=None, size=None, mode='bilinear'):
    """torch F.interpolate equivalent on NHWC (modes: area/bilinear/bicubic,
    antialias=False / adaptive-avg-pool semantics, exact weight parity).
    Implemented as two static weight-matrix contractions — MXU-friendly and
    shape-static under jit."""
    b, h, w, c = img.shape
    if size is None:
        oh, ow = int(h * scale_factor), int(w * scale_factor)
    else:
        oh, ow = size
    if (oh, ow) == (h, w) and mode != 'area':
        return img
    Wh = jnp.asarray(_resize_weights(h, oh, mode, scale_factor))
    Ww = jnp.asarray(_resize_weights(w, ow, mode, scale_factor))
    out = jnp.einsum('oh,bhwc->bowc', Wh, img)
    return jnp.einsum('pw,bowc->bopc', Ww, out)
