"""Sampler quality comparison on a trained toy model (run on TPU, ~5 min
first time; the trained params cache in /tmp/toy_sampler_params.msgpack).

Trains the small guided diffusion model from tools/convergence_check.py and
scores each sampler's restoration PSNR. r3 measured (4000 steps, bf16):
input 15.3 dB; ddpm50 ~33 dB, ddim5(eta=1) ~30 dB, dpmpp20 (ODE) ~20 dB,
dpmpp20_sde — the point of this tool: the SDE variant injects fresh noise
per step (like ancestral), which keeps denoiser error from accumulating
along the ODE trajectory on the aggressive linear_end=0.4 schedule.
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from flax import serialization
from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.diffusion import ResiGaussianGuideDY, super_resolution
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train import make_optimizer, create_train_state, make_train_step
from ucdir_tpu.metrics import calculate_psnr, tensor2img

CACHE = '/tmp/toy_sampler_params.msgpack'
rng = np.random.default_rng(0)


def make_batch(n):
    yy, xx = np.mgrid[0:64, 0:64]
    imgs, noisy = [], []
    for _ in range(n):
        p1, p2 = rng.uniform(5, 30), rng.uniform(5, 30)
        img = 0.5 * np.sin(xx / p1 + rng.uniform(0, 6)) \
            + 0.5 * np.cos(yy / p2 + rng.uniform(0, 6))
        img3 = np.stack([img, np.roll(img, 7, 0), np.roll(img, 7, 1)], -1) * .5
        imgs.append(np.clip(img3, -1, 1))
        noisy.append(np.clip(img3 + rng.normal(0, 0.35, img3.shape), -1, 1))
    return {'HR': jnp.asarray(np.stack(imgs), jnp.float32),
            'SR': jnp.asarray(np.stack(noisy), jnp.float32)}


def main():
    unet = DY3h(in_channel=6, out_channel=3, inner_channel=16,
                channel_mults=(1, 2, 4), attn_res=(), res_blocks=1,
                dropout=0.0, norm_groups=1, image_size=64, remat=False)
    module = ResiGaussianGuideDY(denoise_fn=unet, image_size=64, channels=3)
    key = jax.random.PRNGKey(0)
    b0 = make_batch(16)
    variables = jax.jit(module.init)(
        {'params': key, 'dropout': key}, b0, jnp.ones((16, 1)) * .5,
        jnp.zeros_like(b0['HR']))

    if os.path.exists(CACHE) and '--retrain' not in sys.argv:
        with open(CACHE, 'rb') as fh:
            params = serialization.from_bytes(variables['params'], fh.read())
        print('# loaded cached toy params', flush=True)
    else:
        sched = make_schedule(dict(schedule='linear', n_timestep=2000,
                                   linear_start=1e-6, linear_end=1e-2))
        tx = make_optimizer({'type': 'adamw', 'lr': 3e-4})
        state = create_train_state(variables['params'], tx,
                                   {'use': True, 'ema_decay': 0.999,
                                    'step_start_ema': 100,
                                    'update_ema_every': 1})
        step = make_train_step(module, sched, compute_dtype=jnp.bfloat16)
        t0 = time.time()
        batch = b0
        for i in range(4000):
            key, k = jax.random.split(key)
            batch = make_batch(16) if i % 10 == 0 else batch
            state, m = step(state, batch, k)
            if i % 500 == 0:
                print('step %d l_pix %.4f (%.0fs)'
                      % (i, float(m['l_pix']), time.time() - t0), flush=True)
        params = jax.device_get(state.params)
        with open(CACHE, 'wb') as fh:
            fh.write(serialization.to_bytes(params))

    vsched = make_schedule(dict(schedule='linear', n_timestep=50,
                                linear_start=1e-6, linear_end=0.4))
    val = make_batch(4)
    hrs = [tensor2img(np.asarray(val['HR'][i])) for i in range(4)]
    print('input %.2f dB' % np.mean(
        [calculate_psnr(tensor2img(np.asarray(val['SR'][i])), hrs[i])
         for i in range(4)]), flush=True)

    cases = [('ddpm', 50), ('ddim', 5), ('ddim', 20),
             ('dpmpp', 20), ('dpmpp_sde', 20), ('dpmpp_sde', 10)]
    for name, steps in cases:
        f = jax.jit(lambda v, x, k, name=name, steps=steps: super_resolution(
            module, v, vsched, x, k, sampler=name, sampling_timesteps=steps,
            eta=1.0, compute_dtype=jnp.bfloat16)[0])
        sr = f({'params': params}, val['SR'], jax.random.PRNGKey(5))
        p = np.mean([calculate_psnr(tensor2img(np.asarray(sr[i])), hrs[i])
                     for i in range(4)])
        print('%-12s steps=%-3d %.2f dB' % (name, steps, p), flush=True)


if __name__ == '__main__':
    main()
