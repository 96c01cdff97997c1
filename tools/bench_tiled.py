"""Tiled denoiser-step timing at real SID resolution (1424x2128)."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from ucdir_tpu.models.dy3h import DY3h
from ucdir_tpu.parallel.tiled import tiled_denoise_fn, compute_tile_starts

key = jax.random.PRNGKey(0)
dt = jnp.bfloat16
H, W = 1424 + 128, 2128 + 128   # after the 64-px eval pad

m = DY3h(in_channel=6, out_channel=3, inner_channel=64,
         channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
         dropout=0.0, norm_groups=1, image_size=128)
x_cond = jax.random.normal(key, (1, H, W, 3), dt)
guide = jax.random.normal(key, (1, H, W, 3), dt)
img = jax.random.normal(key, (1, H, W, 3), dt)
nl = jnp.full((1, 1), 0.5, dt)

v = jax.eval_shape(m.init, {'params': key, 'dropout': key},
                   jnp.zeros((1, 64, 64, 6), dt), nl, jnp.zeros((1, 64, 64, 3), dt))
v = jax.tree_util.tree_map(lambda a: jax.random.normal(key, a.shape, dt) * 0.05, v)

starts = compute_tile_starts(H + 2 * 64, W + 2 * 64, 1024, 64)
print('tiles:', len(starts), starts, flush=True)

import sys as _sys
_tc = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1
denoise = tiled_denoise_fn(m, v['params'], x_cond, guide, skip=1024, padding=64,
                           tile_chunk=_tc)
f = jax.jit(denoise)
t0 = time.perf_counter()
out = f(img, nl)
float(jnp.sum(out.astype(jnp.float32)))
print('compile+first: %.1fs' % (time.perf_counter() - t0), flush=True)
t0 = time.perf_counter()
out = f(img, nl)
float(jnp.sum(out.astype(jnp.float32)))
dtime = time.perf_counter() - t0
print('tiled denoise step %dx%d: %.2f s  (-> ~%.0fs for 50 steps)'
      % (H, W, dtime, dtime * 50), flush=True)
