"""Tile-scoped GroupNorm(1) (UCDIR_TPU_GN_SCOPE=tile, ops/gn_scope.py).

Validates (a) the per-window normalize against per-slice nn.GroupNorm
including ragged edge windows, and (b) that the end-to-end DY3h eval program
engages the scope only when the knob is set, is identical to the default when
every map fits one window, and changes the statistics scope when windows
engage (the reference's effective per-tile scope, model/ucdir.py:75-100 under
utils/util.py:108-146).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from ucdir_tpu.ops.gn_scope import tile_gn, gn_canvas, gn_tile_window


def _ref_window_gn(x, scale, bias, win, eps=1e-5):
    """Per-window GN(1) by explicit slicing — the semantics oracle."""
    B, H, W, C = x.shape
    out = np.zeros_like(np.asarray(x, np.float32))
    gn = lambda t: np.asarray(
        nn.GroupNorm(num_groups=1, epsilon=eps).apply(
            {'params': {'scale': scale, 'bias': bias}}, jnp.asarray(t)))
    for y0 in range(0, H, win):
        for x0 in range(0, W, win):
            sl = np.asarray(x[:, y0:y0 + win, x0:x0 + win, :], np.float32)
            out[:, y0:y0 + win, x0:x0 + win, :] = gn(sl)
    return out


@pytest.mark.parametrize('hw', [(8, 8), (12, 10)])  # exact + ragged windows
def test_tile_gn_matches_per_slice_groupnorm(hw):
    H, W = hw
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, H, W, 5)), jnp.float32)
    scale = jnp.asarray(rng.normal(size=(5,)) + 1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(5,)), jnp.float32)
    got = np.asarray(tile_gn(x, scale, bias, win=4))
    want = _ref_window_gn(x, scale, bias, win=4)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_tile_gn_single_window_is_plain_gn():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 6, 7, 4)), jnp.float32)
    scale = jnp.ones((4,), jnp.float32)
    bias = jnp.zeros((4,), jnp.float32)
    got = np.asarray(tile_gn(x, scale, bias, win=16))
    want = np.asarray(nn.GroupNorm(num_groups=1, epsilon=1e-5).apply(
        {'params': {'scale': scale, 'bias': bias}}, x))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_gn_tile_window_gating():
    # knob off -> always None
    assert gn_tile_window(512, 512) is None
    os.environ['UCDIR_TPU_GN_SCOPE'] = 'tile'
    try:
        # no canvas recorded -> None
        assert gn_tile_window(512, 512) is None
        with gn_canvas(2048, 2048):
            # /1 map over 1.5x window -> windows of 1024
            assert gn_tile_window(2048, 2048) == 1024
            # /8 map: k=8, win=128; 256 > 192 -> windows (the h/win ratio is
            # scale-invariant: deeper maps still span 2 canvas tiles)
            assert gn_tile_window(256, 256) == 128
            assert gn_tile_window(128, 128) == 64
        # canvas within 1.5 tiles -> canvas scope (folded kernels) everywhere
        with gn_canvas(1536, 1536):
            assert gn_tile_window(1536, 1536) is None
            assert gn_tile_window(192, 192) is None
        # a 1152 tile canvas (reference tiled path): single window, no-op
        with gn_canvas(1152, 1152):
            assert gn_tile_window(1152, 1152) is None
    finally:
        del os.environ['UCDIR_TPU_GN_SCOPE']


def _tiny_model():
    from ucdir_tpu.models.dy3h import DY3h
    from ucdir_tpu.diffusion import ResiGaussianGuideDY
    unet = DY3h(in_channel=6, out_channel=3, inner_channel=8,
                channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
                norm_groups=1, image_size=32, remat=False)
    return ResiGaussianGuideDY(denoise_fn=unet, image_size=32, channels=3)


def test_e2e_scope_engages_only_with_knob():
    from ucdir_tpu.schedule import make_schedule
    from ucdir_tpu.train.step import make_eval_step
    module = _tiny_model()
    key = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(key, (1, 32, 32, 3), jnp.float32, -1, 1)
    variables = module.init({'params': key, 'dropout': key},
                            {'HR': x0, 'SR': x0}, jnp.ones((1, 1)) * .5,
                            jnp.zeros_like(x0))
    sched = make_schedule(dict(schedule='linear', n_timestep=4,
                               linear_start=1e-4, linear_end=0.1))
    x = jax.random.uniform(jax.random.fold_in(key, 1), (1, 48, 48, 3),
                           jnp.float32, -1, 1)
    ev = make_eval_step(module, sched, pad=0)
    base = np.asarray(ev(variables, x, key)[0])

    os.environ['UCDIR_TPU_GN_SCOPE'] = 'tile'
    try:
        # window >= canvas: every map fits one window -> identical program
        os.environ['UCDIR_TPU_GN_TILE'] = '4096'
        same = np.asarray(make_eval_step(module, sched, pad=0)(
            variables, x, key)[0])
        np.testing.assert_array_equal(base, same)
        # small windows: the scope engages and the output must change
        os.environ['UCDIR_TPU_GN_TILE'] = '16'
        tiled = np.asarray(make_eval_step(module, sched, pad=0)(
            variables, x, key)[0])
        assert np.abs(tiled - base).max() > 1e-6
        assert np.isfinite(tiled).all()
    finally:
        del os.environ['UCDIR_TPU_GN_SCOPE']
        del os.environ['UCDIR_TPU_GN_TILE']
