"""DiffJPEG + degradation op tests, incl. an oracle parity test against the
reference torch DiffJPEG (importable: torch + numpy only)."""
import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucdir_tpu.data.diffjpeg import diff_jpeg, quality_to_factor
from ucdir_tpu.data import degradations as D

REF = '/root/reference'


def test_quality_to_factor():
    assert float(quality_to_factor(10)) == pytest.approx(5.0)
    assert float(quality_to_factor(50)) == pytest.approx(1.0)
    assert float(quality_to_factor(95)) == pytest.approx(0.10, abs=1e-6)


def test_diffjpeg_identity_high_quality():
    # smooth image: chroma subsampling is lossless only for slowly-varying
    # chroma; q=95 (q=100 gives factor 0 -> div-by-zero, as in the reference)
    yy, xx = np.mgrid[0:32, 0:32] / 32.
    x = jnp.asarray(np.stack([yy, xx, (yy + xx) / 2], -1)[None], jnp.float32)
    out = jax.jit(lambda x: diff_jpeg(x, 95., differentiable=False))(x)
    assert float(jnp.mean(jnp.abs(out - x))) < 0.02


def test_diffjpeg_quality_ordering(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
    f = jax.jit(lambda x, q: diff_jpeg(x, q, differentiable=False))
    e10 = float(jnp.mean((f(x, 10.) - x) ** 2))
    e50 = float(jnp.mean((f(x, 50.) - x) ** 2))
    e90 = float(jnp.mean((f(x, 90.) - x) ** 2))
    assert e10 > e50 > e90


def test_diffjpeg_nondivisible_and_batch_quality(rng):
    x = jnp.asarray(rng.random((2, 40, 56, 3)), jnp.float32)
    q = jnp.asarray([10., 90.])
    out = jax.jit(lambda x, q: diff_jpeg(x, q, differentiable=False))(x, q)
    assert out.shape == x.shape
    e0 = float(jnp.mean((out[0] - x[0]) ** 2))
    e1 = float(jnp.mean((out[1] - x[1]) ** 2))
    assert e0 > e1


def test_diffjpeg_differentiable_grads(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 3)), jnp.float32)
    g = jax.grad(lambda x: jnp.sum(diff_jpeg(x, 50.)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.max(jnp.abs(g))) > 0


@pytest.mark.skipif(not os.path.isdir(REF), reason='no reference checkout')
def test_diffjpeg_parity_vs_torch(rng):
    if REF not in sys.path:
        sys.path.append(REF)
    torch = pytest.importorskip('torch')
    from data.diffjpeg import DiffJPEG as TorchDiffJPEG

    x = rng.random((2, 32, 48, 3)).astype(np.float32)
    tm = TorchDiffJPEG(differentiable=False)
    with torch.no_grad():
        want = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                  quality=torch.tensor([20., 80.])).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(jax.jit(
        lambda x: diff_jpeg(x, jnp.asarray([20., 80.]),
                            differentiable=False))(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-3)


# ---------------------------- degradations ----------------------------------

def test_filter2d_matches_manual(rng):
    img = jnp.asarray(rng.random((2, 12, 12, 3)), jnp.float32)
    k = rng.random((2, 5, 5)).astype(np.float32)
    k = k / k.sum(axis=(1, 2), keepdims=True)
    out = jax.jit(D.filter2D)(img, jnp.asarray(k))
    # manual correlate on sample 0, channel 1, interior pixel
    pad = np.pad(np.asarray(img[0, :, :, 1]), 2, mode='reflect')
    want = float((pad[3:8, 4:9] * k[0]).sum())
    assert float(out[0, 3, 4, 1]) == pytest.approx(want, rel=1e-4)


def test_usm_sharp_runs(rng):
    img = jnp.asarray(rng.random((1, 32, 32, 3)), jnp.float32)
    out = jax.jit(D.usm_sharp)(img)
    assert out.shape == img.shape
    assert float(jnp.min(out)) >= 0 and float(jnp.max(out)) <= 1


def test_kernel_generators_normalized(rng):
    for fn in (D.bivariate_Gaussian, ):
        k = fn(21, 2.0, 1.0, 0.5, isotropic=False)
        assert k.shape == (21, 21)
        assert k.sum() == pytest.approx(1.0)
    k = D.random_mixed_kernels(
        ['iso', 'aniso', 'generalized_iso', 'generalized_aniso',
         'plateau_iso', 'plateau_aniso'], [1 / 6] * 6, 21)
    assert k.sum() == pytest.approx(1.0)
    k = D.circular_lowpass_kernel(np.pi / 2, 13, pad_to=21)
    assert k.shape == (21, 21)
    assert k.sum() == pytest.approx(1.0, abs=1e-6)


def test_device_noise_ops(rng):
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(rng.random((2, 16, 16, 3)), jnp.float32)
    g = jax.jit(lambda k, x: D.random_add_gaussian_noise_pt(
        k, x, sigma_range=(5, 10), gray_prob=0.5))(key, img)
    assert g.shape == img.shape
    assert float(jnp.max(jnp.abs(g - img))) > 0
    assert float(jnp.min(g)) >= 0 and float(jnp.max(g)) <= 1
    p = jax.jit(lambda k, x: D.random_add_poisson_noise_pt(
        k, x, scale_range=(0.5, 2.0), gray_prob=0.5))(key, img)
    assert p.shape == img.shape
    assert float(jnp.min(p)) >= 0 and float(jnp.max(p)) <= 1


def test_host_noise_ops(rng):
    img = rng.random((16, 16, 3)).astype(np.float32)
    out = D.random_add_gaussian_noise(img, (5, 10), gray_prob=0.5)
    assert out.shape == img.shape
    out = D.random_add_poisson_noise(img, (0.5, 2.0), gray_prob=0.5)
    assert out.shape == img.shape
    out = D.random_add_speckle_noise(img, (5, 10))
    assert out.min() >= 0 and out.max() <= 1
    out = D.random_add_saltpepper_noise(img, (0.01, 0.05), (0.3, 0.7))
    assert out.shape == img.shape
    out = D.add_jpg_compression(img, 50)
    assert out.shape == img.shape
