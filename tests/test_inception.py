"""InceptionV3-JAX structure tests: output shape and converter key-path
compatibility (weights themselves are unavailable offline)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ucdir_tpu.metrics.inception import (InceptionV3Features, preprocess,
                                         convert_inception_torch)
from ucdir_tpu.metrics.fid import fid_from_features, kid_from_features


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


@pytest.fixture(scope='module')
def init_params():
    m = InceptionV3Features()
    x = jnp.zeros((1, 299, 299, 3))
    return jax.eval_shape(m.init, jax.random.PRNGKey(0), x)['params']


def test_feature_shape(init_params):
    m = InceptionV3Features()
    flat = _flatten(init_params)
    out = jax.eval_shape(
        lambda p, x: m.apply({'params': p}, x),
        init_params, jnp.zeros((2, 299, 299, 3)))
    assert out.shape == (2, 2048)


def test_param_count_reasonable(init_params):
    n = sum(int(np.prod(s.shape)) for s in _flatten(init_params).values())
    # torchvision inception_v3 features (without fc/aux) ~ 21.8M params
    assert 20e6 < n < 25e6, n


def test_converter_roundtrip_structure(init_params):
    """Build a fake torch state_dict from the flax shapes; the converter must
    reproduce exactly the flax param tree (paths + shapes)."""
    flat = _flatten(init_params)
    sd = {}
    for path, arr in flat.items():
        pref = '.'.join(path[:-2]) if path[-2:] == ('conv', 'kernel') else \
            '.'.join(path[:-1])
        if path[-2:] == ('conv', 'kernel'):
            kh, kw, ci, co = arr.shape
            sd[pref + '.conv.weight'] = np.zeros((co, ci, kh, kw), np.float32)
            c = co
            sd[pref + '.bn.weight'] = np.ones((c,), np.float32)
            sd[pref + '.bn.bias'] = np.zeros((c,), np.float32)
            sd[pref + '.bn.running_mean'] = np.zeros((c,), np.float32)
            sd[pref + '.bn.running_var'] = np.ones((c,), np.float32)
    converted = _flatten(convert_inception_torch(sd))
    want_paths = set(flat.keys())
    got_paths = set(converted.keys())
    assert got_paths == want_paths, (
        sorted(want_paths - got_paths)[:5], sorted(got_paths - want_paths)[:5])
    for p in want_paths:
        assert converted[p].shape == tuple(flat[p].shape), p


def test_preprocess():
    img = np.random.default_rng(0).integers(0, 256, (2, 64, 80, 3),
                                            dtype=np.uint8)
    out = preprocess(img)
    assert out.shape == (2, 299, 299, 3)
    assert float(out.min()) >= -1 and float(out.max()) <= 1


def test_fid_kid_math(rng):
    a = rng.standard_normal((200, 16)).astype(np.float64)
    b = a + 0.0
    assert fid_from_features(a, b) == pytest.approx(0.0, abs=1e-6)
    c = rng.standard_normal((200, 16)) + 3.0
    assert fid_from_features(a, c) > 5.0
    assert abs(kid_from_features(a, b, num_subsets=10, max_subset_size=100)) < 0.3
    assert kid_from_features(a, c, num_subsets=10, max_subset_size=100) > 1.0
