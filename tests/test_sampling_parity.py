"""Posterior-step parity vs the reference torch diffusion wrapper.

Builds the torch ResiGaussianGuideDY (predictor + DY3h) with random init,
converts the state dict, and checks one deterministic p_mean_variance step
(noise-level lookup -> guided denoise -> x0 prediction -> clamp -> posterior
mean/logvar) matches between frameworks — the strongest in-environment
evidence that a converted released checkpoint samples identically.
"""
import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference'
torch = pytest.importorskip('torch')
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason='reference checkout not available')

if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

# the reference diffusion module imports `lpips` at top level (absent here);
# stub it — only PerceptualGaussianDiffusion touches it.
if 'lpips' not in sys.modules:
    stub = types.ModuleType('lpips')
    stub.LPIPS = lambda **kw: None
    sys.modules['lpips'] = stub

import jax
import jax.numpy as jnp

from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.diffusion import ResiGaussianGuideDY
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.utils.convert_torch import convert_state_dict


def test_p_mean_variance_parity(rng):
    from model.diffusion import ResiGaussianGuideDY as TorchDiff
    from model.ucdir import DY3h as TorchDY3h

    torch.manual_seed(0)
    cfg = dict(in_channel=6, out_channel=3, inner_channel=8,
               channel_mults=[1, 2], attn_res=[32], res_blocks=1,
               dropout=0, norm_groups=1, image_size=64)
    tnet = TorchDY3h(**cfg)
    tdiff = TorchDiff(tnet, image_size=64, channels=3, loss_type='l1').eval()
    sched_opt = dict(schedule='linear', n_timestep=10, linear_start=1e-6,
                     linear_end=0.4)
    tdiff.set_new_noise_schedule(sched_opt, device='cpu')

    params = convert_state_dict(tdiff.state_dict())
    junet = DY3h(in_channel=6, out_channel=3, inner_channel=8,
                 channel_mults=(1, 2), attn_res=(32,), res_blocks=1,
                 dropout=0.0, norm_groups=1, image_size=64)
    jdiff = ResiGaussianGuideDY(denoise_fn=junet, image_size=64, channels=3)
    sched = make_schedule(sched_opt)

    x = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
    cond = rng.standard_normal((1, 64, 64, 3)).astype(np.float32) * 0.5
    t = 6

    # torch: initx then p_mean_variance on the guided denoiser
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    tcond = torch.from_numpy(cond.transpose(0, 3, 1, 2))
    with torch.no_grad():
        initx_t = tdiff.predictor(tcond)
        mean_t, logvar_t = tdiff.p_mean_variance(
            tx, t, clip_denoised=True, condition_x=tcond,
            kwargs={'guide': initx_t})
    mean_t = mean_t.numpy().transpose(0, 2, 3, 1)

    # ours: same computation via schedule coefficients + module.denoise
    variables = {'params': params}
    jx, jcond = jnp.asarray(x), jnp.asarray(cond)
    initx = jdiff.apply(variables, jcond, method='predict_init')
    np.testing.assert_allclose(np.asarray(initx),
                               initx_t.numpy().transpose(0, 2, 3, 1),
                               rtol=1e-3, atol=1e-4)
    nl = jnp.full((1, 1), float(sched.sqrt_alphas_cumprod_prev[t + 1]),
                  jnp.float32)
    eps = jdiff.apply(variables, jnp.concatenate([jcond, jx], -1), nl, initx,
                      method='denoise')
    x0 = (sched.sqrt_recip_alphas_cumprod[t] * jx
          - sched.sqrt_recipm1_alphas_cumprod[t] * eps)
    x0 = jnp.clip(x0, -1., 1.)
    mean_j = (sched.posterior_mean_coef1[t] * x0
              + sched.posterior_mean_coef2[t] * jx)
    logvar_j = float(sched.posterior_log_variance_clipped[t])

    np.testing.assert_allclose(np.asarray(mean_j), mean_t,
                               rtol=2e-3, atol=2e-4)
    assert logvar_j == pytest.approx(float(logvar_t), rel=1e-5)
