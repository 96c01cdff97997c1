"""Fused Pallas AKGM kernel vs the XLA reference (interpret mode on CPU)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops.akgm import akgm_mix_reference
from ucdir_tpu.ops.akgm_pallas import akgm_mix_pallas


def _data(rng, B=1, H=6, W=16, C=16, G=8):
    h = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.float32)
    att = jnp.asarray(rng.standard_normal((B, H, W, G)) * 0.5, jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((3, 3, C // G, C * G)) * 0.1,
                         jnp.float32)
    bias = jnp.asarray(rng.standard_normal((C * G,)) * 0.1, jnp.float32)
    return h, att, kernel, bias, G


def test_pallas_matches_reference(rng):
    h, att, kernel, bias, G = _data(rng)
    want = akgm_mix_reference(h, att, kernel, bias, G)
    with pltpu.force_tpu_interpret_mode():
        got = akgm_mix_pallas(h, att, kernel, bias, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_matches_reference_batched_larger(rng):
    h, att, kernel, bias, G = _data(rng, B=2, H=8, W=24, C=32)
    want = akgm_mix_reference(h, att, kernel, bias, G)
    with pltpu.force_tpu_interpret_mode():
        got = akgm_mix_pallas(h, att, kernel, bias, G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_gradients_match_reference(rng):
    h, att, kernel, bias, G = _data(rng, H=4, W=8, C=16)

    def loss_ref(h, a, k, b):
        return jnp.sum(akgm_mix_reference(h, a, k, b, G) ** 2)

    def loss_pl(h, a, k, b):
        return jnp.sum(akgm_mix_pallas(h, a, k, b, G) ** 2)

    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(h, att, kernel, bias)
    with pltpu.force_tpu_interpret_mode():
        got = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(h, att, kernel, bias)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-4)


# --- fused block tail (padded + pad-free forwards) -------------------------

from ucdir_tpu.ops.akgm_pallas import (
    _akgm_block_forward, _akgm_block_forward_padfree, _block_ref)


def _block_data(rng, B=1, H=8, W=16, C=16, G=8, fold=False, attw=False):
    h, att, kernel, bias, _ = _data(rng, B=B, H=H, W=W, C=C, G=G)
    res = jnp.asarray(rng.standard_normal((B, H, W, C)) * 0.5, jnp.float32)
    ns = nt = aw = None
    if fold:
        ns = jnp.asarray(rng.standard_normal((B, C)) * 0.3 + 1.0, jnp.float32)
        nt = jnp.asarray(rng.standard_normal((B, C)) * 0.2, jnp.float32)
    if attw:
        aw = jnp.asarray(rng.standard_normal((B, G)) * 0.5 + 1.0, jnp.float32)
    return h, att, kernel, bias, res, G, ns, nt, aw


@pytest.mark.parametrize('fold', [False, True])
def test_block_padded_matches_reference(rng, fold, monkeypatch):
    monkeypatch.setenv('UCDIR_TPU_PADFREE', '0')
    h, att, k, b, res, G, ns, nt, aw = _block_data(rng, B=2, fold=fold,
                                                   attw=True)
    want = _block_ref(h, att, k, b, res, G, ns, nt, aw)
    with pltpu.force_tpu_interpret_mode():
        got = _akgm_block_forward(h, att, k, b, res, G, ns, nt, aw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('attw_on', [False, True])
def test_block_fused_backward_matches_reference(rng, fold, attw_on):
    from ucdir_tpu.ops.akgm_pallas import _akgm_block_backward, _block_ref
    h, att, k, b, res, G, ns, nt, aw = _block_data(rng, B=2, H=8, W=16,
                                                   fold=fold, attw=attw_on)
    g = jnp.asarray(np.random.default_rng(7).standard_normal(res.shape) * 0.3,
                    jnp.float32)

    live = [x for x in (h, att, k, b, res) + ((ns, nt) if fold else ())
            + ((aw,) if attw_on else ())]

    def ref(*xs):
        base = xs[:5]
        ns_, nt_ = (xs[5], xs[6]) if fold else (None, None)
        aw_ = xs[-1] if attw_on else None
        return _block_ref(*base, G, ns_, nt_, aw_)

    _, vjp = jax.vjp(ref, *live)
    want = vjp(g)
    with pltpu.force_tpu_interpret_mode():
        got = _akgm_block_backward(h, att, k, b, res, g, G, ns, nt, aw,
                                   rows_per_block=2)
    names = ['dh', 'datt', 'dkernel', 'dbias', 'dres', 'dns', 'dnt', 'dattw']
    idx = {False: [0, 1, 2, 3, 4], True: [0, 1, 2, 3, 4, 5, 6]}[fold]
    if attw_on:
        idx = idx + [7]
    for w_, i in zip(want, idx):
        assert got[i] is not None, names[i]
        np.testing.assert_allclose(np.asarray(got[i]), np.asarray(w_),
                                   rtol=2e-3, atol=1e-4, err_msg=names[i])
    if not fold:
        assert got[5] is None and got[6] is None
    if not attw_on:
        assert got[7] is None


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('R', [2, 4])
def test_block_padfree_matches_reference(rng, fold, R, monkeypatch):
    # pin XCOL=0: covers the 9-tap scratch staging branch (the XCOL default
    # flip in r3 would otherwise leave it untested)
    monkeypatch.setenv('UCDIR_TPU_XCOL', '0')
    h, att, k, b, res, G, ns, nt, aw = _block_data(rng, B=2, fold=fold,
                                                   attw=True)
    want = _block_ref(h, att, k, b, res, G, ns, nt, aw)
    with pltpu.force_tpu_interpret_mode():
        got = _akgm_block_forward_padfree(h, att, k, b, res, G, ns, nt, aw,
                                          rows_per_block=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('R', [2, 4])
def test_block_grouped_matches_reference(rng, fold, R, monkeypatch):
    """v4 per-group kernel (correct pairing, no densified waste): parity vs
    the XLA reference at Cg=C/G>=2 — the pairing (candidate j of channel c
    reads group c//(C/G), reference model/ucdir.py:132-137) is exactly what
    the archived packed v3 kernel got wrong, so this is the load-bearing
    assertion."""
    from ucdir_tpu.ops.akgm_pallas import _akgm_block_forward_grouped
    h, att, k, b, res, G, ns, nt, aw = _block_data(rng, B=2, C=32,
                                                   fold=fold, attw=True)
    want = _block_ref(h, att, k, b, res, G, ns, nt, aw)
    with pltpu.force_tpu_interpret_mode():
        got = _akgm_block_forward_grouped(h, att, k, b, res, G, ns, nt, aw,
                                          rows_per_block=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_block_grouped_dispatch_gate(monkeypatch):
    from ucdir_tpu.ops.akgm_pallas import grouped_tail_enabled
    assert not grouped_tail_enabled(512, 8)            # knob off
    monkeypatch.setenv('UCDIR_TPU_AKGM_GROUPED', '1')
    assert grouped_tail_enabled(512, 8)                # Cg=64
    assert grouped_tail_enabled(256, 8)                # Cg=32
    assert not grouped_tail_enabled(128, 8)            # Cg=16 < 32
    monkeypatch.setenv('UCDIR_TPU_AKGM_GROUPED', 'all')
    assert grouped_tail_enabled(64, 8)                 # Cg=8 experiment floor


@pytest.mark.parametrize('fold', [False, True])
@pytest.mark.parametrize('R', [1, 2, 4])
def test_block_xcol_matches_reference(rng, fold, R, monkeypatch):
    monkeypatch.setenv('UCDIR_TPU_XCOL', '1')
    h, att, k, b, res, G, ns, nt, aw = _block_data(rng, B=2, fold=fold,
                                                   attw=True)
    want = _block_ref(h, att, k, b, res, G, ns, nt, aw)
    with pltpu.force_tpu_interpret_mode():
        got = _akgm_block_forward_padfree(h, att, k, b, res, G, ns, nt, aw,
                                          rows_per_block=R)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
