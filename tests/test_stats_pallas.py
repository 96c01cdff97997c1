"""One-pass GN(1) stats kernel vs the XLA reference (interpret mode)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from ucdir_tpu.ops.stats_pallas import gn1_stats_pallas, _stats_forward


@pytest.mark.parametrize('shape', [(1, 8, 16, 16), (2, 12, 16, 8)])
def test_stats_match_xla(rng, shape):
    x = jnp.asarray(rng.standard_normal(shape) * 0.5, jnp.float32)
    xf = x.astype(jnp.float32)
    ws = jnp.sum(xf, axis=(1, 2))
    wq = jnp.sum(jnp.square(xf), axis=(1, 2))
    with pltpu.force_tpu_interpret_mode():
        s, q = _stats_forward(x)
    np.testing.assert_allclose(np.asarray(s[:, 0]), np.asarray(ws),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(q[:, 0]), np.asarray(wq),
                               rtol=1e-5, atol=1e-5)


def test_stats_gradient(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 16, 8)) * 0.5, jnp.float32)

    def loss_k(x):
        with pltpu.force_tpu_interpret_mode():
            s, q = gn1_stats_pallas(x)
        return jnp.sum(s * 2.0) + jnp.sum(q * 0.5)

    def loss_ref(x):
        xf = x.astype(jnp.float32)
        return (jnp.sum(jnp.sum(xf, axis=(1, 2))) * 2.0
                + jnp.sum(jnp.sum(jnp.square(xf), axis=(1, 2))) * 0.5)

    g_k = jax.grad(loss_k)(x)
    g_r = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g_k), np.asarray(g_r),
                               rtol=1e-5, atol=1e-6)
