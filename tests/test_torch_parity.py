"""Numerical parity vs the reference PyTorch implementation (oracle test).

Builds the reference torch modules from /root/reference (read-only import),
converts their randomly-initialized state dicts with
ucdir_tpu.utils.convert_torch, and checks our flax forward passes reproduce
the torch outputs. This validates layer semantics AND the checkpoint
converter in one shot. Skipped when the reference checkout is unavailable.
"""
import os
import sys

import numpy as np
import pytest

REF = '/root/reference'
torch = pytest.importorskip('torch')
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not available')

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

import jax
import jax.numpy as jnp

from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.models.seeindark import UNetSeeInDark
from ucdir_tpu.utils.convert_torch import convert_dy3h, convert_seeindark


def nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc).transpose(0, 3, 1, 2))


def nhwc(t_nchw):
    return t_nchw.detach().numpy().transpose(0, 2, 3, 1)


@pytest.fixture(scope='module')
def ref_modules():
    from model import ucdir as ref_ucdir
    return ref_ucdir


def test_seeindark_parity(ref_modules, rng):
    torch.manual_seed(0)
    tm = ref_modules.UNetSeeInDark().eval()
    params = convert_seeindark(tm.state_dict())
    jm = UNetSeeInDark()

    x = rng.standard_normal((1, 40, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = nhwc(tm(nchw(x)))
    got = np.asarray(jax.jit(jm.apply)({'params': params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dy3h_parity(ref_modules, rng):
    torch.manual_seed(0)
    # 64x64 input (torch reflect pad requires pad < dim, so >=33px inputs);
    # attn at 32 covers the attention path after one downsample.
    cfg = dict(in_channel=6, out_channel=3, inner_channel=8,
               channel_mults=[1, 2], attn_res=[32], res_blocks=1,
               dropout=0, norm_groups=1, image_size=64)
    tm = ref_modules.DY3h(**cfg).eval()
    params = convert_dy3h(tm.state_dict())
    jm = DY3h(in_channel=6, out_channel=3, inner_channel=8,
              channel_mults=(1, 2), attn_res=(32,), res_blocks=1,
              dropout=0.0, norm_groups=1, image_size=64)

    x = rng.standard_normal((2, 64, 64, 6)).astype(np.float32) * 0.5
    guide = rng.standard_normal((2, 64, 64, 3)).astype(np.float32) * 0.5
    nl = np.full((2, 1), 0.7, np.float32)
    with torch.no_grad():
        want = nhwc(tm(nchw(x), torch.from_numpy(nl), nchw(guide)))
    got = np.asarray(jax.jit(
        lambda v: jm.apply(v, jnp.asarray(x), jnp.asarray(nl),
                           jnp.asarray(guide)))({'params': params}))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)


def test_dy3h_parity_nondivisible_size(ref_modules, rng):
    """Exercises the reflect pad-to-/32 + crop wrapper on both sides."""
    torch.manual_seed(1)
    cfg = dict(in_channel=6, out_channel=3, inner_channel=8,
               channel_mults=[1, 2], attn_res=[], res_blocks=1,
               dropout=0, norm_groups=1, image_size=48)
    tm = ref_modules.DY3h(**cfg).eval()
    params = convert_dy3h(tm.state_dict())
    jm = DY3h(in_channel=6, out_channel=3, inner_channel=8,
              channel_mults=(1, 2), attn_res=(), res_blocks=1,
              dropout=0.0, norm_groups=1, image_size=48)

    x = rng.standard_normal((1, 48, 40, 6)).astype(np.float32) * 0.5
    guide = rng.standard_normal((1, 48, 40, 3)).astype(np.float32) * 0.5
    nl = np.full((1, 1), 0.3, np.float32)
    with torch.no_grad():
        want = nhwc(tm(nchw(x), torch.from_numpy(nl), nchw(guide)))
    got = np.asarray(jax.jit(
        lambda v: jm.apply(v, jnp.asarray(x), jnp.asarray(nl),
                           jnp.asarray(guide)))({'params': params}))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-4)
