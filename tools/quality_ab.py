"""Quality A/B for the untiled+windowed headline eval path (VERDICT r3 #3).

The r3 headline runs >1024^2 images UNTILED (seamless whole-image UNet,
windowed attention above 16384 tokens) while the reference tiles them
(model/ucdir.py:295-307, 1024px tiles / 64px halos, global attention per
tile at /8 = 128^2 = 16384 tokens). This measures the QUALITY side of that
redesign on a trained model:

  1. trains a toy sid-SHAPED guided diffusion model — attention at the /8
     scale exactly like configs/sid.yaml (tile/8 = 128^2 tokens -> GLOBAL
     inside a reference tile; windowed on the bigger untiled map) — on
     synthetic denoising pairs until it restores well past the input PSNR;
  2. samples ONE >1024^2 held-out image three ways through the REAL eval
     program (train/step.make_eval_step):
       A untiled + windowed attention        (the shipped headline default)
       B reference-semantics tiled           (tile {1024, 64}, resident)
       C untiled + GLOBAL attention          (UCDIR_TPU_ATTN_WINDOW_TOKENS
                                              raised; isolates the windowed
                                              softmax from the tiling delta)
  3. prints PSNR vs GT for each + pairwise deltas. The reverse processes
     draw different noise (different canvas paddings), so pairwise numbers
     include sampler stochasticity; PSNR-vs-GT is the quality verdict.

Run on TPU: timeout 3600 python tools/quality_ab.py [H W] (default
1152x1664: padded /8 map 160x216 = 34,560 tokens -> windowed untiled, two
1024-tiles-per-axis tiled). Results recorded in PARITY.md.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
# a JAX_PLATFORMS env prefix does NOT override the axon plugin for ad-hoc
# scripts; honor the conventional knob via config (CLAUDE.md)
if os.environ.get('UCDIR_TPU_QAB_PLATFORM'):
    jax.config.update('jax_platforms', os.environ['UCDIR_TPU_QAB_PLATFORM'])
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 '/root/.cache/jax_comp_cache'))
import jax.numpy as jnp

from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.diffusion import ResiGaussianGuideDY
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train import (make_optimizer, create_train_state,
                             make_train_step)
from ucdir_tpu.train.step import make_eval_step
from ucdir_tpu.metrics import calculate_psnr, tensor2img

rng = np.random.default_rng(0)
NOISE_SIGMA = 0.35


def clean_canvas(h, w, seed):
    """Smooth multi-scale sin/cos pattern — translation-covariant content so
    a 64px-crop-trained model generalizes to any canvas size."""
    r = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w))
    for _ in range(6):
        p1, p2 = r.uniform(8, 60), r.uniform(8, 60)
        img += r.uniform(0.1, 0.4) * np.sin(
            xx / p1 + r.uniform(0, 6)) * np.cos(yy / p2 + r.uniform(0, 6))
    img3 = np.stack([img, np.roll(img, 9, 0), np.roll(img, 9, 1)], -1)
    return np.clip(img3, -1, 1)


def make_batch(n, s=64):
    imgs = np.stack([clean_canvas(s, s, int(rng.integers(1 << 30)))
                     for _ in range(n)])
    noisy = np.clip(imgs + rng.normal(0, NOISE_SIGMA, imgs.shape), -1, 1)
    return {'HR': jnp.asarray(imgs, jnp.float32),
            'SR': jnp.asarray(noisy, jnp.float32)}


def run(H=1152, W=1664, steps=3000, crop=64, seeds=(123, 456, 789),
        leg_names=None):
    """Train the toy model and measure the eval-path legs.

    Returns {'input_psnr': float, 'legs': {letter: {'name', 'mean', 'std',
    'psnrs'}}, 'crop': crop, 'H': H, 'W': W}. leg_names: optional iterable of
    leg letters to run (default: A, B, C, F — the r5 decision set).
    """
    nb = max(4, (16 * 64 * 64) // (crop * crop))   # keep tokens/batch const

    # sid-shaped toy: attention at /8 (attn_res 8 with image_size 64), same
    # norm_groups/diffusion family as configs/sid.yaml, 16x thinner
    unet = DY3h(in_channel=6, out_channel=3, inner_channel=16,
                channel_mults=(1, 2, 4, 8), attn_res=(8,), res_blocks=1,
                dropout=0.0, norm_groups=1, image_size=crop, remat=False)
    module = ResiGaussianGuideDY(denoise_fn=unet, image_size=crop,
                                 channels=3)
    key = jax.random.PRNGKey(0)
    b0 = make_batch(nb, crop)
    variables = jax.jit(module.init)(
        {'params': key, 'dropout': key}, b0, jnp.ones((nb, 1)) * .5,
        jnp.zeros_like(b0['HR']))
    sched = make_schedule(dict(schedule='linear', n_timestep=2000,
                               linear_start=1e-6, linear_end=1e-2))
    tx = make_optimizer({'type': 'adamw', 'lr': 3e-4})
    state = create_train_state(
        variables['params'], tx,
        {'use': True, 'ema_decay': 0.999, 'step_start_ema': 100,
         'update_ema_every': 1})
    step = make_train_step(module, sched, compute_dtype=jnp.bfloat16)

    t0 = time.time()
    batch = b0
    for i in range(steps):
        key, k = jax.random.split(key)
        if i % 10 == 0:
            batch = make_batch(nb, crop)
        state, m = step(state, batch, k)
        if i % 500 == 0:
            print('train %d l_pix %.4f (%.0fs)' %
                  (i, float(m['l_pix']), time.time() - t0), flush=True)
    params = {'params': jax.device_get(state.params)}

    # held-out big image
    gt = clean_canvas(H, W, seed=777)
    noisy = np.clip(gt + np.random.default_rng(7).normal(
        0, NOISE_SIGMA, gt.shape), -1, 1)
    x = jnp.asarray(noisy[None], jnp.float32)
    gt8 = tensor2img(gt)
    input_psnr = calculate_psnr(tensor2img(noisy), gt8)
    print('input PSNR %.2f dB' % input_psnr, flush=True)

    vsched = make_schedule(dict(schedule='linear', n_timestep=50,
                                linear_start=1e-6, linear_end=0.4))
    legs = [
        ('A untiled+windowed', dict(pad=64), {}),
        ('B tiled-resident {1024,64}', dict(
            pad=64, tile={'skip': 1024, 'padding': 64}, seg_steps=25), {}),
        ('C untiled+GLOBAL-attn', dict(pad=64),
         {'UCDIR_TPU_ATTN_WINDOW_TOKENS': '1000000000'}),
        ('D untiled+windowed+SHIFT', dict(pad=64),
         {'UCDIR_TPU_ATTN_SHIFT': '1'}),
        ('E untiled+row-BAND windows', dict(pad=64),
         {'UCDIR_TPU_ATTN_BANDS': '1'}),
        # F: per-1024^2-window GN(1) stats inside the seamless whole-image
        # program (ops/gn_scope.py) — isolates the reference's per-tile
        # statistics SCOPE from its tiling overlap/seams (VERDICT r4 #2).
        ('F untiled+GN-SCOPE-tile', dict(pad=64),
         {'UCDIR_TPU_GN_SCOPE': 'tile'}),
    ]
    if leg_names is None:
        leg_names = ('A', 'B', 'C', 'F')
    legs = [l for l in legs if l[0][0] in set(leg_names)]
    outs = {}
    results = {}
    for name, kw, env in legs:
        for e, v in env.items():
            os.environ[e] = v
        ev = make_eval_step(module, vsched, compute_dtype=jnp.bfloat16, **kw)
        t0 = time.time()
        psnrs = []
        for s in seeds:   # ancestral sampling is stochastic — average seeds
            out = ev(params, x, jax.random.PRNGKey(s))[0]
            out = np.asarray(out.astype(jnp.float32))
            psnrs.append(calculate_psnr(tensor2img(out[0]), gt8))
            if s == seeds[0]:
                outs[name[0]] = out[0]
        for e in env:
            del os.environ[e]
        print('QAB %s: PSNR %.2f +- %.2f dB over %d seeds %s '
              '(%.0fs incl. compile)' %
              (name, float(np.mean(psnrs)), float(np.std(psnrs)),
               len(seeds), ['%.2f' % p for p in psnrs],
               time.time() - t0), flush=True)
        results[name[0]] = {'name': name, 'mean': float(np.mean(psnrs)),
                            'std': float(np.std(psnrs)),
                            'psnrs': [float(p) for p in psnrs]}

    for a, b in (('A', 'B'), ('A', 'C')):
        if a not in outs or b not in outs:
            continue
        d = outs[a] - outs[b]
        print('QAB %s-vs-%s: pairwise PSNR %.2f dB, mean|d| %.4f, max|d| '
              '%.3f (includes sampler noise — different canvas paddings '
              'draw different keys)' %
              (a, b, calculate_psnr(tensor2img(outs[a]),
                                    tensor2img(outs[b])),
               float(np.abs(d).mean()), float(np.abs(d).max())), flush=True)
    return {'input_psnr': float(input_psnr), 'legs': results,
            'crop': crop, 'H': H, 'W': W, 'train_steps': steps,
            'seeds': list(seeds)}


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 1152
    W = int(sys.argv[2]) if len(sys.argv) > 2 else 1664
    steps = int(os.environ.get('QAB_TRAIN_STEPS', '3000'))
    crop = int(os.environ.get('QAB_CROP', '64'))   # training crop; attn at
    # crop/8 tokens per axis — QAB_CROP=128/256 probes how the
    # untiled-vs-tiled gap scales with the trained attention/GN scope
    seeds = [int(s) for s in os.environ.get('QAB_SEEDS',
                                            '123,456,789').split(',')]
    leg_names = os.environ.get('QAB_LEGS')  # e.g. 'ABCF'
    run(H, W, steps=steps, crop=crop, seeds=seeds,
        leg_names=list(leg_names) if leg_names else None)


if __name__ == '__main__':
    main()
