"""End-to-end learning check (run on TPU, ~4 min): trains a small guided
diffusion model on synthetic denoising pairs and asserts the 50-step sampled
restoration beats the noisy input. Measured: input 15.3 dB -> guidance UNet
20.5 dB -> sampled 33.1 dB after 4000 steps (bf16, single v5e chip)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax, jax.numpy as jnp

rng = np.random.default_rng(0)


def make_batch(n):
    yy, xx = np.mgrid[0:64, 0:64]
    imgs, noisy = [], []
    for i in range(n):
        p1, p2 = rng.uniform(5, 30), rng.uniform(5, 30)
        img = 0.5*np.sin(xx/p1 + rng.uniform(0,6)) + 0.5*np.cos(yy/p2 + rng.uniform(0,6))
        img3 = np.stack([img, np.roll(img, 7, 0), np.roll(img, 7, 1)], -1) * 0.5
        imgs.append(np.clip(img3, -1, 1))
        noisy.append(np.clip(img3 + rng.normal(0, 0.35, img3.shape), -1, 1))
    return {'HR': jnp.asarray(np.stack(imgs), jnp.float32),
            'SR': jnp.asarray(np.stack(noisy), jnp.float32)}


def run(train_steps: int = 4000):
    """Train + sample; returns {'input_db', 'initx_db', 'ddpm50_db'}."""
    from ucdir_tpu.models.dy3h import DY3h
    from ucdir_tpu.diffusion import ResiGaussianGuideDY, super_resolution
    from ucdir_tpu.schedule import make_schedule
    from ucdir_tpu.train import (make_optimizer, create_train_state,
                                 make_train_step)
    from ucdir_tpu.metrics import calculate_psnr, tensor2img

    unet = DY3h(in_channel=6, out_channel=3, inner_channel=16,
                channel_mults=(1, 2, 4), attn_res=(), res_blocks=1,
                dropout=0.0, norm_groups=1, image_size=64, remat=False)
    module = ResiGaussianGuideDY(denoise_fn=unet, image_size=64, channels=3)
    key = jax.random.PRNGKey(0)
    b0 = make_batch(16)
    variables = jax.jit(module.init)({'params': key, 'dropout': key}, b0,
                                     jnp.ones((16,1))*.5, jnp.zeros_like(b0['HR']))
    sched = make_schedule(dict(schedule='linear', n_timestep=2000,
                               linear_start=1e-6, linear_end=1e-2))
    tx = make_optimizer({'type': 'adamw', 'lr': 3e-4})
    state = create_train_state(variables['params'], tx,
                               {'use': True, 'ema_decay': 0.999, 'step_start_ema': 100,
                                'update_ema_every': 1})
    step = make_train_step(module, sched, compute_dtype=jnp.bfloat16)

    t0 = time.time()
    batch = b0
    for i in range(train_steps):
        key, k = jax.random.split(key)
        batch = make_batch(16) if i % 10 == 0 else batch
        state, m = step(state, batch, k)
        if i % 300 == 0:
            print('step %d l_pix %.4f (%.0fs)' % (i, float(m['l_pix']), time.time()-t0), flush=True)

    vsched = make_schedule(dict(schedule='linear', n_timestep=50,
                                linear_start=1e-6, linear_end=0.4))
    val = make_batch(4)
    f = jax.jit(lambda v, x, k: super_resolution(module, v, vsched, x, k,
                                                 compute_dtype=jnp.bfloat16)[0])
    sr = f({'params': state.params}, val['SR'], key)
    initx = jax.jit(lambda v, x: module.apply(v, x, method='predict_init'))(
        {'params': state.params}, val['SR'])
    psnr_in, psnr_out, psnr_init = [], [], []
    for i in range(4):
        hr = tensor2img(np.asarray(val['HR'][i]))
        psnr_in.append(calculate_psnr(tensor2img(np.asarray(val['SR'][i])), hr))
        psnr_out.append(calculate_psnr(tensor2img(np.asarray(sr[i])), hr))
        psnr_init.append(calculate_psnr(tensor2img(np.asarray(initx[i])), hr))
    print('input %.2f dB -> initx %.2f dB -> sampled %.2f dB' %
          (np.mean(psnr_in), np.mean(psnr_init), np.mean(psnr_out)), flush=True)
    assert np.mean(psnr_out) > np.mean(psnr_in) + 2, 'did not learn to denoise!'
    print('LEARNING VERIFIED', flush=True)
    return {'input_db': float(np.mean(psnr_in)),
            'initx_db': float(np.mean(psnr_init)),
            'ddpm50_db': float(np.mean(psnr_out)),
            'train_steps': train_steps}


if __name__ == '__main__':
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 4000)
