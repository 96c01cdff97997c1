"""Metric tests: self-consistency + parity with the reference where its
dependencies allow importing it (torchvision/skimage are absent in this image,
so core.metrics / metric.ssim cannot be imported; metric.niqe can)."""
import os
import sys

import numpy as np
import pytest

from ucdir_tpu.metrics import (tensor2img, calculate_psnr, calculate_ssim)
from ucdir_tpu.metrics.ssim import (calculate_psnr as psnr_b,
                                    calculate_ssim as ssim_b, to_y_channel)
from ucdir_tpu.metrics.niqe import calculate_niqe

REF = '/root/reference'


def test_tensor2img_roundtrip():
    x = np.linspace(-1, 1, 3 * 8 * 8).reshape(1, 8, 8, 3).astype(np.float32)
    img = tensor2img(x)
    assert img.dtype == np.uint8 and img.shape == (8, 8, 3)
    assert img.min() == 0 and img.max() == 255


def test_tensor2img_grid():
    x = np.zeros((4, 8, 8, 3), np.float32)
    img = tensor2img(x)
    # 2x2 grid with padding 2: 2*(8+2)+2 = 22
    assert img.shape == (22, 22, 3)


def test_psnr_basics(rng):
    a = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    assert calculate_psnr(a, a) == float('inf')
    b = np.clip(a.astype(int) + 10, 0, 255).astype(np.uint8)
    p = calculate_psnr(a, b)
    assert 20 < p < 40


def test_ssim_identity(rng):
    a = rng.integers(0, 256, (64, 64, 3)).astype(np.uint8)
    assert calculate_ssim(a, a) == pytest.approx(1.0, abs=1e-6)
    assert ssim_b(a, a) == pytest.approx(1.0, abs=1e-6)


def test_ssim_degrades_with_noise(rng):
    a = rng.integers(0, 256, (64, 64, 3)).astype(np.float64)
    noise = rng.normal(0, 20, a.shape)
    b = np.clip(a + noise, 0, 255)
    s = ssim_b(a, b)
    assert 0 < s < 0.99


def test_psnr_crop_border_and_y(rng):
    a = rng.integers(0, 256, (64, 64, 3)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 5, a.shape), 0, 255)
    p_full = psnr_b(a, b, crop_border=0)
    p_crop = psnr_b(a, b, crop_border=8)
    p_y = psnr_b(a, b, crop_border=0, test_y_channel=True)
    assert all(np.isfinite([p_full, p_crop, p_y]))
    assert p_y > p_full - 10


def test_y_channel_range(rng):
    a = rng.integers(0, 256, (16, 16, 3)).astype(np.float64)
    y = to_y_channel(a)
    assert y.shape == (16, 16, 1)
    assert y.min() >= 10 and y.max() <= 240  # BT.601 studio swing


def test_niqe_runs(rng):
    # natural-ish image: smooth gradient + texture
    yy, xx = np.mgrid[0:128, 0:128]
    img = (128 + 50 * np.sin(xx / 8.0) * np.cos(yy / 11.0)
           + rng.normal(0, 10, (128, 128)))
    img3 = np.clip(np.stack([img] * 3, -1), 0, 255)
    q = calculate_niqe(img3, crop_border=0)
    assert np.isfinite(q) and q > 0


@pytest.mark.skipif(not os.path.isdir(REF), reason='no reference checkout')
def test_niqe_parity_vs_reference(rng):
    if REF not in sys.path:
        sys.path.append(REF)
    try:
        from metric.niqe import calculate_niqe as ref_niqe
    except Exception as e:
        pytest.skip('reference metric.niqe unimportable: %s' % e)
    yy, xx = np.mgrid[0:200, 0:200]
    img = (120 + 40 * np.sin(xx / 7.0) + 30 * np.cos(yy / 13.0)
           + rng.normal(0, 12, (200, 200)))
    img3 = np.clip(np.stack([img] * 3, -1), 0, 255).astype(np.float32)
    cwd = os.getcwd()
    os.chdir(REF)  # reference loads './metric/niqe_pris_params.npz'
    try:
        # reference expects BGR; ours expects RGB — gray input, so identical
        want = float(ref_niqe(img3, crop_border=0))
    finally:
        os.chdir(cwd)
    got = calculate_niqe(img3, crop_border=0)
    assert got == pytest.approx(want, rel=1e-4)
