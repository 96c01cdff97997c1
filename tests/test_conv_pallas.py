"""Fused Pallas 3x3/1x1 conv kernels vs the XLA reference (interpret mode).

Covers the padded forward, the pad-free forward (in-kernel SAME-border
staging — top/interior/bottom grid programs), the folded-GroupNorm affine
variant of both, and the 1x1 kernel. Reference semantics:
/root/reference/model/ucdir.py:75-100 (Block conv) — here checked against
the plain XLA composition, which the torch-parity suite pins separately.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops.conv_pallas import (
    _conv3x3_forward, _conv3x3_forward_padfree, _conv1x1_forward,
    _c3_ref, conv1x1_xla)


def _data(rng, B=1, H=8, W=16, Cin=16, Cout=24, fold=False):
    x = jnp.asarray(rng.standard_normal((B, H, W, Cin)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, Cin, Cout)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((Cout,)) * 0.1, jnp.float32)
    if not fold:
        return x, k, b, None, None
    ns = jnp.asarray(rng.standard_normal((B, Cin)) * 0.3 + 1.0, jnp.float32)
    nt = jnp.asarray(rng.standard_normal((B, Cin)) * 0.2, jnp.float32)
    return x, k, b, ns, nt


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('act', [None, 'swish'])
def test_padded_forward_matches_xla(rng, fold, act):
    x, k, b, ns, nt = _data(rng, fold=fold)
    want = _c3_ref(x, k, b, act, ns, nt)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_forward(x, k, b, act, ns, nt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('R', [2, 4])
def test_padfree_forward_matches_xla(rng, fold, R, monkeypatch):
    # pin XCOL=0: this test covers the 9-tap scratch staging branch, which
    # the XCOL default flip ('1', r3) would otherwise leave untested
    monkeypatch.setenv('UCDIR_TPU_XCOL', '0')
    # H/R >= 2 so the top/interior/bottom branches all execute; B=2 checks
    # the per-batch fold operand indexing
    x, k, b, ns, nt = _data(rng, B=2, H=8, W=16, fold=fold)
    want = _c3_ref(x, k, b, 'swish', ns, nt)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_forward_padfree(x, k, b, 'swish', ns, nt,
                                       rows_per_block=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('R', [1, 2, 4])
def test_xcol_forward_matches_xla(rng, fold, R, monkeypatch):
    monkeypatch.setenv('UCDIR_TPU_XCOL', '1')
    x, k, b, ns, nt = _data(rng, B=2, H=8, W=16, fold=fold)
    want = _c3_ref(x, k, b, 'swish', ns, nt)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_forward_padfree(x, k, b, 'swish', ns, nt,
                                       rows_per_block=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_xcol_preact_matches_xla(rng, monkeypatch):
    monkeypatch.setenv('UCDIR_TPU_XCOL', '1')
    from ucdir_tpu.ops.conv_pallas import _c3p_ref
    x, k, b, ns, nt = _data(rng, B=2, H=8, W=16, fold=True)
    want = _c3p_ref(x, k, b, ns, nt)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_forward_padfree(x, k, b, None, ns, nt,
                                       rows_per_block=2, pre_act='swish')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_padfree_two_blocks_boundary(rng, monkeypatch):
    # ny == 2: both boundary branches, no interior program (XCOL=0 pins the
    # 9-tap scratch staging branch)
    monkeypatch.setenv('UCDIR_TPU_XCOL', '0')
    x, k, b, ns, nt = _data(rng, H=8, fold=False)
    want = _c3_ref(x, k, b, None, None, None)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_forward_padfree(x, k, b, None, rows_per_block=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('act', [None, 'swish'])
def test_fused_backward_matches_xla(rng, fold, act):
    from ucdir_tpu.ops.conv_pallas import _conv3x3_backward
    x, k, b, ns, nt = _data(rng, B=2, H=8, W=16, fold=fold)
    g = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 8, 16, 24)) * 0.3, jnp.float32)
    live = (x, k, b) + ((ns, nt) if fold else ())

    def ref(*xs):
        ns_, nt_ = (xs[3], xs[4]) if fold else (None, None)
        return _c3_ref(xs[0], xs[1], xs[2], act, ns_, nt_)

    _, vjp = jax.vjp(ref, *live)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_backward(x, k, b, g, act, ns, nt, rows_per_block=2)
    names = ['dx', 'dkernel', 'dbias', 'dns', 'dnt']
    for w_, g_, n_ in zip(want, got, names):
        np.testing.assert_allclose(np.asarray(g_), np.asarray(w_),
                                   rtol=2e-3, atol=1e-4, err_msg=n_)
    if not fold:
        assert got[3] is None and got[4] is None


@pytest.mark.parametrize('R', [2, 4])
def test_preact_head_matches_xla(rng, R):
    from ucdir_tpu.ops.conv_pallas import _c3p_ref
    x, k, b, ns, nt = _data(rng, B=2, H=8, W=16, fold=True)
    want = _c3p_ref(x, k, b, ns, nt)
    with pltpu.force_tpu_interpret_mode():
        got = _conv3x3_forward_padfree(x, k, b, None, ns, nt,
                                       rows_per_block=R, pre_act='swish')
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_upconv2x_exact_vs_resize_conv(rng):
    from ucdir_tpu.ops.conv_pallas import upconv2x, conv3x3_xla
    x, k, b, _, _ = _data(rng, B=2, H=6, W=10, Cin=8, Cout=12)
    up = jax.image.resize(x, (2, 12, 20, 8), method='nearest')
    want = conv3x3_xla(up, k, b, None)
    got = upconv2x(x, k, b, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_upconv2x_pallas_path_matches(rng):
    from ucdir_tpu.ops.conv_pallas import (_conv3x3_forward, _pack_up_kernel,
                                           depth_to_space2, conv3x3_xla)
    x, k, b, _, _ = _data(rng, B=1, H=8, W=16, Cin=8, Cout=8)
    up = jax.image.resize(x, (1, 16, 32, 8), method='nearest')
    want = conv3x3_xla(up, k, b, None)
    kp = _pack_up_kernel(k)
    bp = jnp.tile(b, (4,))
    with pltpu.force_tpu_interpret_mode():
        y = _conv3x3_forward(x, kp, bp, None)
    got = depth_to_space2(y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('R', [1, 2, 4])
@pytest.mark.parametrize('fold', [False, True])
def test_downconv_matches_xla(rng, R, fold):
    from ucdir_tpu.ops.conv_pallas import _downconv_forward, downconv_xla
    x, k, b, ns, nt = _data(rng, B=2, H=16, W=24, Cin=8, Cout=16, fold=fold)
    want = downconv_xla(x, k, b, ns, nt)
    with pltpu.force_tpu_interpret_mode():
        got = _downconv_forward(x, k, b, ns, nt, R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_downconv_gradient(rng):
    from ucdir_tpu.ops.conv_pallas import downconv2x_pallas, downconv_xla
    x, k, b, _, _ = _data(rng, B=1, H=8, W=12, Cin=8, Cout=8)

    def lk(x, k, b):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(downconv2x_pallas(x, k, b, None, None) ** 2)

    def lr(x, k, b):
        return jnp.sum(downconv_xla(x, k, b) ** 2)

    gk = jax.grad(lk, (0, 1, 2))(x, k, b)
    gr = jax.grad(lr, (0, 1, 2))(x, k, b)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('act', [None, 'swish'])
def test_conv1x1_matches_xla(rng, act):
    x, _, _, _, _ = _data(rng)
    k = jnp.asarray(rng.standard_normal((1, 1, 16, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    want = conv1x1_xla(x, k, b, act)
    with pltpu.force_tpu_interpret_mode():
        got = _conv1x1_forward(x, k, b, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
