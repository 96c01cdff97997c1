"""Diffusion process + sampler tests (tiny nets, jitted, CPU mesh)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.diffusion import (ResiGaussianGuideDY, GaussianDiffusion,
                                 ResiGaussianGuideDY_initxloss,
                                 p_sample_loop, ddim_sample, super_resolution,
                                 sample_continuous_gamma)
from ucdir_tpu.schedule import make_schedule

KEY = jax.random.PRNGKey(0)
VAL_SCHED = dict(schedule='linear', n_timestep=10, linear_start=1e-6, linear_end=0.4)


def tiny_module(cls=ResiGaussianGuideDY):
    unet = DY3h(in_channel=6, out_channel=3, inner_channel=8,
                channel_mults=(1, 2), attn_res=(16,), res_blocks=1,
                dropout=0.0, norm_groups=1, image_size=32)
    return cls(denoise_fn=unet, image_size=32, channels=3, loss_type='l1')


def init_vars(module, b=2, s=32):
    x_in = {'HR': jnp.zeros((b, s, s, 3)), 'SR': jnp.zeros((b, s, s, 3))}
    gammas = jnp.ones((b, 1)) * 0.5
    noise = jnp.zeros((b, s, s, 3))
    return jax.jit(module.init)({'params': KEY, 'dropout': KEY},
                                x_in, gammas, noise), x_in


def test_gamma_sampling_in_segment():
    sched = make_schedule(dict(schedule='linear', n_timestep=2000,
                               linear_start=1e-6, linear_end=1e-2))
    g = jax.jit(lambda k: sample_continuous_gamma(k, sched, 64))(KEY)
    assert g.shape == (64, 1)
    arr = np.asarray(g)
    assert (arr > 0).all() and (arr <= 1).all()
    # all gammas in a batch share one t-segment -> tight spread
    t_edges = np.asarray(sched.sqrt_alphas_cumprod_prev)
    seg = np.max(np.abs(np.diff(np.sort(t_edges))))
    assert arr.max() - arr.min() <= seg + 1e-6


def test_p_losses_finite_and_positive():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(VAL_SCHED)
    g = sample_continuous_gamma(KEY, sched, 2)
    noise = jax.random.normal(KEY, (2, 32, 32, 3))
    loss = jax.jit(lambda v: module.apply(v, x_in, g, noise,
                                          deterministic=True))(variables)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_initxloss_variant_larger_loss():
    m1 = tiny_module(ResiGaussianGuideDY)
    m2 = tiny_module(ResiGaussianGuideDY_initxloss)
    v, x_in = init_vars(m1)
    x_in = {'HR': jnp.ones((2, 32, 32, 3)) * 0.5, 'SR': jnp.zeros((2, 32, 32, 3))}
    sched = make_schedule(VAL_SCHED)
    g = sample_continuous_gamma(KEY, sched, 2)
    noise = jax.random.normal(KEY, (2, 32, 32, 3))
    l1 = float(jax.jit(lambda v: m1.apply(v, x_in, g, noise, deterministic=True))(v))
    l2 = float(jax.jit(lambda v: m2.apply(v, x_in, g, noise, deterministic=True))(v))
    assert l2 > l1  # extra 0.5*|initx - HR| term


def test_super_resolution_end_to_end():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(VAL_SCHED)
    f = jax.jit(lambda v, x, k: super_resolution(module, v, sched, x, k))
    sr, initx = f(variables, x_in['SR'], KEY)
    assert sr.shape == (2, 32, 32, 3)
    assert initx.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_super_resolution_continuous_snapshots():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(VAL_SCHED)
    f = jax.jit(lambda v, x, k: super_resolution(module, v, sched, x, k,
                                                 continous=True))
    sr, initx, snaps = f(variables, x_in['SR'], KEY)
    # T=10 -> sample_inter = 1|(10//10) = 1 -> one snapshot per step, plus the
    # prepended x_in frame (reference ret_img starts as x, diffusion.py:199)
    assert snaps.shape == (11, 2, 32, 32, 3)
    # frame 0 = x_in + initx (the reference adds initx to all of ret_img)
    np.testing.assert_allclose(np.asarray(snaps[0]),
                               np.asarray(x_in['SR'] + initx),
                               rtol=1e-5, atol=1e-5)
    # last snapshot equals the final (both already include +initx)
    np.testing.assert_allclose(np.asarray(snaps[-1]), np.asarray(sr),
                               rtol=1e-5, atol=1e-5)


def test_snapshot_cadence_matches_reference_loop():
    """Frame-identical to the torch loop's snapshot schedule
    (diffusion.py:188-211): ret_img = [x_in] + img at every i%(1|(T//10))==0,
    i descending — verified by replaying the scan's RNG in a python loop."""
    from ucdir_tpu.diffusion.sampler import p_sample_loop
    sched = make_schedule(dict(schedule='linear', n_timestep=50,
                               linear_start=1e-6, linear_end=0.4))
    x_cond = jnp.linspace(-1, 1, 1 * 8 * 8 * 3).reshape(1, 8, 8, 3)

    def denoise(img, nl):
        return 0.1 * img + nl.reshape(-1, 1, 1, 1) * 0.01

    final, snaps = jax.jit(lambda k: p_sample_loop(
        denoise, x_cond, sched, k, continous=True))(KEY)

    # python replay with the reference's snapshot bookkeeping
    T = 50
    sample_inter = 1 | (T // 10)
    key, k0 = jax.random.split(KEY)
    img = jax.random.normal(k0, x_cond.shape, x_cond.dtype)
    ret = [np.asarray(x_cond)]
    for t in range(T - 1, -1, -1):
        key, k = jax.random.split(key)
        eps = denoise(img, jnp.full((1, 1), 0.) +
                      sched.sqrt_alphas_cumprod_prev[t + 1])
        x0 = jnp.clip(sched.sqrt_recip_alphas_cumprod[t] * img
                      - sched.sqrt_recipm1_alphas_cumprod[t] * eps, -1, 1)
        mean = (sched.posterior_mean_coef1[t] * x0
                + sched.posterior_mean_coef2[t] * img)
        noise = jax.random.normal(k, img.shape, img.dtype)
        if t == 0:
            noise = jnp.zeros_like(noise)
        img = mean + noise * jnp.exp(
            0.5 * sched.posterior_log_variance_clipped[t])
        if t % sample_inter == 0:
            ret.append(np.asarray(img))

    assert snaps.shape[0] == len(ret) == 11
    np.testing.assert_allclose(np.asarray(snaps), np.stack(ret),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(final), ret[-1],
                               rtol=1e-5, atol=1e-6)


def test_ddim_sampler_runs():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(dict(schedule='linear', n_timestep=50,
                               linear_start=1e-6, linear_end=0.4))
    f = jax.jit(lambda v, x, k: super_resolution(
        module, v, sched, x, k, sampler='ddim', sampling_timesteps=5, eta=1.0))
    sr, initx = f(variables, x_in['SR'], KEY)
    assert sr.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(sr)).all()


def test_sampling_deterministic_given_key():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(VAL_SCHED)
    f = jax.jit(lambda v, x, k: super_resolution(module, v, sched, x, k)[0])
    a = f(variables, x_in['SR'], KEY)
    b = f(variables, x_in['SR'], KEY)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_dpm_solver_pp_runs():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(dict(schedule='linear', n_timestep=50,
                               linear_start=1e-6, linear_end=0.4))
    f = jax.jit(lambda v, x, k: super_resolution(
        module, v, sched, x, k, sampler='dpmpp', sampling_timesteps=10))
    sr, initx = f(variables, x_in['SR'], KEY)
    assert sr.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(sr)).all()
    # deterministic given key
    sr2, _ = f(variables, x_in['SR'], KEY)
    np.testing.assert_array_equal(np.asarray(sr), np.asarray(sr2))


def test_bf16_sampling_close_to_fp32():
    module = tiny_module()
    variables, x_in = init_vars(module)
    sched = make_schedule(VAL_SCHED)
    f32 = jax.jit(lambda v, x, k: super_resolution(module, v, sched, x, k)[0])
    f16 = jax.jit(lambda v, x, k: super_resolution(
        module, v, sched, x, k, compute_dtype=jnp.bfloat16)[0])
    a = np.asarray(f32(variables, x_in['SR'], KEY))
    b = np.asarray(f16(variables, x_in['SR'], KEY))
    assert b.dtype == np.float32  # posterior math stays f32
    assert np.mean(np.abs(a - b)) < 0.05


@pytest.mark.parametrize('name', ['GaussianDiffusion', 'ResiGaussianDiffusion',
                                  'ResiGaussianGuideDY_de',
                                  'ResiPercepGaussianDiffusion'])
def test_all_variant_losses_run(name):
    from ucdir_tpu.diffusion import DIFFUSIONS
    module = tiny_module(DIFFUSIONS[name])
    variables, _ = init_vars(module)
    x_in = {'HR': jnp.ones((2, 32, 32, 3)) * 0.2,
            'SR': jnp.zeros((2, 32, 32, 3))}
    sched = make_schedule(VAL_SCHED)
    g = sample_continuous_gamma(KEY, sched, 2)
    noise = jax.random.normal(KEY, (2, 32, 32, 3))
    loss = jax.jit(lambda v: module.apply(v, x_in, g, noise,
                                          deterministic=True))(variables)
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_nodiffusion_refine():
    from ucdir_tpu.diffusion import DIFFUSIONS
    # NoDiffusion feeds the 3-channel predictor output straight to the
    # denoiser (diffusion.py:633-662) -> in_channel 3
    unet = DY3h(in_channel=3, out_channel=3, inner_channel=8,
                channel_mults=(1, 2), attn_res=(), res_blocks=1,
                dropout=0.0, norm_groups=1, image_size=32)
    module = DIFFUSIONS['NoDiffusion'](denoise_fn=unet, image_size=32,
                                       channels=3)
    x_in = {'HR': jnp.ones((1, 32, 32, 3)) * 0.2,
            'SR': jnp.zeros((1, 32, 32, 3))}
    g = jnp.full((1, 1), 1.0)
    variables = jax.jit(module.init)({'params': KEY, 'dropout': KEY},
                                     x_in, g, jnp.zeros((1, 32, 32, 3)))
    loss = jax.jit(lambda v: module.apply(v, x_in, g,
                                          jnp.zeros((1, 32, 32, 3)),
                                          deterministic=True))(variables)
    assert np.isfinite(float(loss))
    out = jax.jit(lambda v: module.apply(v, x_in['SR'], g,
                                         method='refine'))(variables)
    assert out.shape == (1, 32, 32, 3)

    # super_resolution must route through refine (diffusion.py:650-662):
    # one pass at the fixed noise level sqrt_alphas_cumprod_prev[1], no
    # reverse loop, and NO +initx residual add.
    sched = make_schedule(VAL_SCHED)
    sr, initx = jax.jit(lambda v, x, k: super_resolution(
        module, v, sched, x, k))(variables, x_in['SR'], KEY)
    expect = module.apply(variables, x_in['SR'],
                          jnp.full((1, 1), sched.sqrt_alphas_cumprod_prev[1]),
                          method='refine')
    np.testing.assert_allclose(np.asarray(sr), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)

    # the train step must feed the constant gamma, not random ones
    # (diffusion.py:638-644)
    from ucdir_tpu.train import make_train_step, make_optimizer, create_train_state
    state = create_train_state(variables['params'], make_optimizer(
        {'type': 'adam', 'lr': 1e-4}), None)
    step = make_train_step(module, sched, donate=False)
    _, m1 = step(state, x_in, jax.random.PRNGKey(1))
    g_fix = jnp.full((1, 1), sched.sqrt_alphas_cumprod_prev[1])
    k_g, k_n, _ = jax.random.split(jax.random.PRNGKey(1), 3)
    noise = jax.random.normal(k_n, x_in['HR'].shape, x_in['HR'].dtype)
    b, h, w, c = x_in['HR'].shape
    expect_loss = module.apply(variables, x_in, g_fix, noise,
                               deterministic=False,
                               rngs={'dropout': jax.random.split(
                                   jax.random.PRNGKey(1), 3)[2]}) / (b * c * h * w)
    np.testing.assert_allclose(float(m1['l_pix']), float(expect_loss),
                               rtol=1e-5)


def test_perceptual_variant_gated():
    # without an LPIPS callable the perceptual variant must fail loudly —
    # already at init, which traces p_losses
    from ucdir_tpu.diffusion import DIFFUSIONS
    module = tiny_module(DIFFUSIONS['PerceptualGaussianDiffusion'])
    with pytest.raises(ValueError, match='perceptual_fn'):
        init_vars(module)


def test_unconditional_sample():
    from ucdir_tpu.diffusion import DIFFUSIONS, unconditional_sample
    # unconditional: denoiser input is just the noisy image (3 channels),
    # plain ResnetBlock resname (no guide)
    unet = DY3h(in_channel=3, out_channel=3, inner_channel=8,
                channel_mults=(1, 2), attn_res=(), res_blocks=1,
                dropout=0.0, norm_groups=8, image_size=32,
                resname='ResnetBlock')
    module = DIFFUSIONS['GaussianDiffusion'](denoise_fn=unet, image_size=32,
                                             channels=3, conditional=False)
    x_in = {'HR': jnp.zeros((1, 32, 32, 3)), 'SR': jnp.zeros((1, 32, 32, 3))}
    variables = jax.jit(module.init)(
        {'params': KEY, 'dropout': KEY}, x_in, jnp.ones((1, 1)) * 0.5,
        jnp.zeros((1, 32, 32, 3)))
    sched = make_schedule(VAL_SCHED)
    out = jax.jit(lambda v, k: unconditional_sample(
        module, v, sched, (1, 32, 32, 3), k))(variables, KEY)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dpm_solver_perfect_denoiser_recovers_x0():
    """With an oracle eps(x, t) = (x - alpha_t x0)/sigma_t, both the ODE and
    SDE DPM-Solver++(2M) variants must drive the sample to x0 (solver-math
    correctness independent of any trained model)."""
    from ucdir_tpu.diffusion.dpm_solver import dpm_solver_pp_sample
    sched = make_schedule(dict(schedule='linear', n_timestep=50,
                               linear_start=1e-6, linear_end=0.4))
    rng = np.random.default_rng(3)
    x0_true = jnp.asarray(np.clip(rng.standard_normal((1, 8, 8, 3)) * 0.4,
                                  -1, 1), jnp.float32)
    alphas = jnp.sqrt(sched.alphas_cumprod)
    sigmas = jnp.sqrt(1. - sched.alphas_cumprod)
    # continuous noise level -> discrete t (the sampler conditions on
    # sqrt_alphas_cumprod_prev[t+1] = alphas[t]); traced-friendly lookup
    def denoise(img, noise_level):
        t = jnp.argmin(jnp.abs(alphas - noise_level[0, 0]))
        return (img - alphas[t] * x0_true) / sigmas[t]

    for sde in (False, True):
        out = dpm_solver_pp_sample(denoise, x0_true, sched,
                                   jax.random.PRNGKey(0), steps=20, sde=sde)
        err = float(jnp.mean(jnp.abs(out - x0_true)))
        assert err < 0.02, (sde, err)
