"""Chained GroupNorm(1) stats (producer-emitted sum/sumsq).

The fused kernels emit their output's per-(batch, channel) f32 sum and
sum-of-squares (ops.chain_stats_mode); the next block's folded norm consumes
the totals instead of re-reading the tensor from HBM. Reference semantics
unchanged: GroupNorm(1) -> affine fold (/root/reference/model/ucdir.py:75-120).

Covers: in-kernel emission == XLA sums of the produced tensor (interpret
mode, every kernel variant), gradient flow through the stats outputs, and
the model-level threading algebra (concat adds totals, upsample totals are
depth-to-space invariant, attention voids the chain) via the 'xla' test mode.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops.conv_pallas import (
    _conv3x3_forward, _downconv_forward, _c3_ref, downconv_xla)
from ucdir_tpu.ops.akgm_pallas import _akgm_block_forward, _block_ref


def _sums(out):
    of = np.asarray(out, np.float64).astype(np.float32)
    return of.sum(axis=(1, 2)), (of * of).sum(axis=(1, 2))


@pytest.mark.parametrize('padfree', ['0', '1'])
@pytest.mark.parametrize('fold', [False, True])
def test_conv_emits_output_stats(rng, padfree, fold, monkeypatch):
    monkeypatch.setenv('UCDIR_TPU_PADFREE', padfree)
    x = jnp.asarray(rng.standard_normal((2, 8, 16, 16)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 16, 24)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((24,)) * 0.1, jnp.float32)
    ns = nt = None
    if fold:
        ns = jnp.asarray(rng.standard_normal((2, 16)) * 0.3 + 1., jnp.float32)
        nt = jnp.asarray(rng.standard_normal((2, 16)) * 0.2, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, s, q = _conv3x3_forward(x, k, b, 'swish', ns, nt,
                                     emit_stats=True)
    want = _c3_ref(x, k, b, 'swish', ns, nt)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    ws, wq = _sums(out)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), wq, rtol=1e-5, atol=1e-4)


def test_downconv_emits_output_stats(rng):
    x = jnp.asarray(rng.standard_normal((1, 12, 16, 8)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)) * 0.1, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, s, q = _downconv_forward(x, k, b, emit_stats=True)
    want = downconv_xla(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-5)
    ws, wq = _sums(out)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(q), wq, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize('padfree', ['0', '1'])
def test_akgm_tail_emits_output_stats(rng, padfree, monkeypatch):
    monkeypatch.setenv('UCDIR_TPU_PADFREE', padfree)
    C, G = 16, 8
    h = jnp.asarray(rng.standard_normal((1, 8, 16, C)) * 0.5, jnp.float32)
    att = jnp.asarray(rng.standard_normal((1, 8, 16, G)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, C // G, C * G)) * 0.1,
                    jnp.float32)
    b = jnp.asarray(rng.standard_normal((C * G,)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.standard_normal((1, 8, 16, C)) * 0.5, jnp.float32)
    aw = jnp.asarray(rng.standard_normal((1, G)) * 0.2 + 1., jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out, s, q = _akgm_block_forward(h, att, k, b, res, G, None, None,
                                        aw, emit_stats=True)
    want = _block_ref(h, att, k, b, res, G, None, None, aw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
    ws, wq = _sums(out)
    np.testing.assert_allclose(np.asarray(s), ws, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(q), wq, rtol=1e-5, atol=1e-3)


def test_stats_vjp_matches_reference(rng):
    """Gradients through (out, s, q) — the stats cotangents fold back as
    ds + 2*out*dq — must match differentiating the plain composition."""
    from ucdir_tpu.ops.conv_pallas import conv3x3_stats_pallas
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((8,)) * 0.1, jnp.float32)
    w_o = jnp.asarray(rng.standard_normal((1, 8, 16, 8)), jnp.float32)
    w_s = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)
    w_q = jnp.asarray(rng.standard_normal((1, 8)) * 0.1, jnp.float32)

    def loss_pallas(x, k, b):
        with pltpu.force_tpu_interpret_mode():
            out, s, q = conv3x3_stats_pallas(x, k, b, 'swish')
        return (jnp.sum(out * w_o) + jnp.sum(s * w_s) + jnp.sum(q * w_q))

    def loss_ref(x, k, b):
        out = _c3_ref(x, k, b, 'swish', None, None)
        of = out.astype(jnp.float32)
        s = jnp.sum(of, axis=(1, 2))
        q = jnp.sum(of * of, axis=(1, 2))
        return (jnp.sum(out * w_o) + jnp.sum(s * w_s) + jnp.sum(q * w_q))

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, k, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(x, k, b)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-3, atol=1e-4)


def _dy3h_forward(rng, mode, monkeypatch):
    """Full DY3h forward (2 scales + attention at /2 + skips + final head)
    under a chain-stats mode; 'xla' exercises the threading algebra on CPU."""
    monkeypatch.setenv('UCDIR_TPU_CHAIN_STATS', mode)
    from ucdir_tpu.models.dy3h import DY3h
    m = DY3h(in_channel=6, out_channel=3, inner_channel=8, norm_groups=1,
             channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
             image_size=32)
    key = jax.random.PRNGKey(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 6)) * 0.3, jnp.float32)
    nl = jnp.full((1, 1), 0.5, jnp.float32)
    guide = jnp.asarray(rng.standard_normal((1, 32, 32, 3)) * 0.3,
                        jnp.float32)
    v = m.init({'params': key, 'dropout': key}, x, nl, guide)
    return m.apply(v, x, nl, guide)


def test_model_threading_matches_unchained(monkeypatch):
    got = _dy3h_forward(np.random.default_rng(0), 'xla', monkeypatch)
    want = _dy3h_forward(np.random.default_rng(0), '0', monkeypatch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
