"""DPM-Solver++(2M) sampler as a `lax.scan`.

Parity target: the reference's `dpm_solver` alt driver
(/root/reference/sr.py:185-241), which wraps the external
`dpm_solver_pytorch` package (NoiseScheduleVP discrete + model_wrapper +
DPM-Solver++ multistep order 2, 20 steps, time_uniform). Here the second-order
multistep data-prediction solver (Lu et al. 2022, DPM-Solver++) is implemented
directly over the discrete schedule:

  alpha_t = sqrt(abar_t), sigma_t = sqrt(1 - abar_t), lambda = log(alpha/sigma)
  x0_i    = (x - sigma_i * eps_theta(x, t_i)) / alpha_i
  D_i     = (1 + 1/(2 r_i)) x0_i - 1/(2 r_i) x0_{i-1}        (r_i = h_{i-1}/h_i)
  x_{i+1} = (sigma_{i+1}/sigma_i) x_i - alpha_{i+1} (e^{-h_i} - 1) D_i

with a first-order (DDIM-style data-prediction) step for the first iteration.
The denoiser is conditioned on the continuous noise level
sqrt_alphas_cumprod_prev[t+1], identical to the other samplers.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ucdir_tpu.schedule import NoiseSchedule


def dpm_solver_pp_sample(denoise: Callable, x_cond: jax.Array,
                         sched: NoiseSchedule, key: jax.Array,
                         steps: int = 20, clip_denoised: bool = True,
                         continous: bool = False, sde: bool = False):
    """DPM-Solver++(2M); denoise(img, noise_level (b,1)) -> eps.

    sde=True runs SDE-DPM-Solver++(2M) (Lu et al. 2022 eq. 15 / the official
    dpm_solver repo's 'sde-dpmsolver++' multistep update): fresh noise is
    injected every step, which — like the ancestral sampler — keeps model
    error from accumulating along the deterministic ODE trajectory. On the
    aggressive linear_end=0.4 restoration schedule the ODE variant amplifies
    denoiser error (toy convergence check: ~20 dB vs ddpm50's 33 dB); the
    SDE variant is the recommended few-step sampler here.
    """
    shape = x_cond.shape
    T = sched.num_timesteps
    # time_uniform discretization from T-1 down to 0 (discrete indices)
    ts = np.linspace(T - 1, 0, steps + 1).round().astype(np.int32)

    alphas = jnp.sqrt(sched.alphas_cumprod)
    sigmas = jnp.sqrt(1. - sched.alphas_cumprod)
    lambdas = jnp.log(alphas) - jnp.log(sigmas)

    key, k0 = jax.random.split(key)
    img0 = jax.random.normal(k0, shape, dtype=x_cond.dtype)

    def x0_pred(img, t):
        noise_level = jnp.full((shape[0], 1), 0., dtype=img.dtype) + \
            sched.sqrt_alphas_cumprod_prev[t + 1]
        eps = denoise(img, noise_level)
        x0 = (img - sigmas[t] * eps) / alphas[t]
        if clip_denoised:
            x0 = jnp.clip(x0, -1., 1.)
        return x0

    def step(carry, xs):
        img, x0_prev, h_prev, key = carry
        i = xs
        key, kz = jax.random.split(key)
        t, t_next = ts_dev[i], ts_dev[i + 1]
        x0 = x0_pred(img, t)
        lam, lam_next = lambdas[t], lambdas[t_next]
        h = lam_next - lam

        # second-order multistep correction; first order on the first step
        # (no history) and the final step (lower_order_final, the reference
        # dpm_solver default — stabilizes aggressive schedules)
        r = jnp.where(h_prev != 0, h_prev / h, 1.0)
        use2 = jnp.logical_and(i > 0, i < steps - 1)
        if sde:
            em2h = -jnp.expm1(-2. * h)            # 1 - e^{-2h}
            corr = jnp.where(use2, 0.5 * em2h / r, 0.)
            z = jax.random.normal(kz, shape, dtype=img.dtype)
            img = ((sigmas[t_next] / sigmas[t]) * jnp.exp(-h) * img
                   + alphas[t_next] * em2h * x0
                   + alphas[t_next] * corr * (x0 - x0_prev)
                   + sigmas[t_next] * jnp.sqrt(em2h)
                   * jnp.where(t_next > 0, z, jnp.zeros_like(z)))
        else:
            D = jnp.where(use2,
                          (1 + 1 / (2 * r)) * x0 - (1 / (2 * r)) * x0_prev,
                          x0)
            img = (sigmas[t_next] / sigmas[t]) * img \
                - alphas[t_next] * jnp.expm1(-h) * D
        return (img, x0, h, key), (img if continous else None)

    ts_dev = jnp.asarray(ts)
    (img, x0_last, _, _), ys = jax.lax.scan(
        step, (img0, jnp.zeros(shape, x_cond.dtype),
               jnp.zeros((), x_cond.dtype), key), jnp.arange(steps))
    # final: return the last data prediction at t=0 neighborhood
    if continous:
        return img, ys
    return img
