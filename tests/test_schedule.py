"""Schedule math vs closed forms (SURVEY.md §4 test plan: unit tests on
schedule math vs /root/reference/model/diffusion.py:101-148 semantics)."""
import numpy as np
import pytest

from ucdir_tpu.schedule import make_beta_schedule, make_schedule


SID_TRAIN = dict(schedule='linear', n_timestep=2000, linear_start=1e-6, linear_end=1e-2)
SID_VAL = dict(schedule='linear', n_timestep=50, linear_start=1e-6, linear_end=4e-1)


@pytest.mark.parametrize('name', ['quad', 'linear', 'warmup10', 'warmup50',
                                  'const', 'jsd', 'cosine'])
def test_beta_schedules_shapes_and_bounds(name):
    betas = make_beta_schedule(name, 100, 1e-6, 1e-2)
    assert betas.shape == (100,)
    assert betas.dtype == np.float64
    assert np.all(betas > 0) and np.all(betas <= 1.0)


def test_linear_endpoints():
    betas = make_beta_schedule('linear', 2000, 1e-6, 1e-2)
    assert betas[0] == pytest.approx(1e-6)
    assert betas[-1] == pytest.approx(1e-2)


def test_derived_buffers_closed_forms():
    sched = make_schedule(SID_VAL)
    betas = make_beta_schedule('linear', 50, 1e-6, 4e-1)
    alphas = 1 - betas
    acp = np.cumprod(alphas)
    acp_prev = np.append(1., acp[:-1])

    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), acp, rtol=1e-6)
    # sqrt_alphas_cumprod_prev is length T+1 with leading 1.0
    assert sched.sqrt_alphas_cumprod_prev.shape == (51,)
    assert float(sched.sqrt_alphas_cumprod_prev[0]) == 1.0
    np.testing.assert_allclose(np.asarray(sched.sqrt_alphas_cumprod_prev[1:]),
                               np.sqrt(acp), rtol=1e-6)
    # posterior coefficients
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef1),
        betas * np.sqrt(acp_prev) / (1 - acp), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_mean_coef2),
        (1 - acp_prev) * np.sqrt(alphas) / (1 - acp), rtol=1e-5)
    pv = betas * (1 - acp_prev) / (1 - acp)
    np.testing.assert_allclose(np.asarray(sched.posterior_variance), pv, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(sched.posterior_log_variance_clipped),
        np.log(np.maximum(pv, 1e-20)), rtol=1e-4)
    # reciprocal buffers keep the reference 1e-10 stabilizer
    np.testing.assert_allclose(
        np.asarray(sched.sqrt_recip_alphas_cumprod),
        np.sqrt(1. / (acp + 1e-10)), rtol=1e-6)


def test_schedule_is_pytree():
    import jax
    sched = make_schedule(SID_VAL)
    leaves = jax.tree_util.tree_leaves(sched)
    assert len(leaves) == 13
    # static num_timesteps survives tree ops
    sched2 = jax.tree_util.tree_map(lambda x: x, sched)
    assert sched2.num_timesteps == 50
