"""Integrated SID-resolution segment timing (6 steps) — the fast
proxy for bench.py's headline without the 50-step run. ~12 min first
compile; see CLAUDE.md round-2 notes for the measurement history."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, time
from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.parallel.tiled import tiled_denoise_fn
from ucdir_tpu.diffusion.sampler import ddpm_scan_segment
opt = parse('ucdir_tpu/configs/sid.yaml', phase='val', checkpoint=None, num_processes=1, make_dirs=False)
module = define_G(opt, use_pallas=True)
sched = make_schedule(opt['model']['beta_schedule']['val'])
key = jax.random.PRNGKey(0)
x0 = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32, -1, 1)
variables = jax.jit(module.init)({'params': key, 'dropout': key}, {'HR': x0, 'SR': x0}, jnp.ones((1,1), jnp.float32)*0.5, jnp.zeros_like(x0))
dt = jnp.bfloat16
v16 = jax.tree_util.tree_map(lambda p: p.astype(dt), variables)
H, W = 1424+128, 2128+128
x = jax.random.uniform(key, (1, H, W, 3), dt, -1, 1)
g = jax.random.uniform(key, (1, H, W, 3), dt, -1, 1)
def seg(v, x, g, img, key):
    tiled = tiled_denoise_fn(module.denoise_fn, v['params']['denoise_fn'], x, g,
                             skip=1024, padding=64, tile_chunk=1, data_axis=None)
    def denoise(im, nl): return tiled(im.astype(dt), nl.astype(dt)).astype(im.dtype)
    ts = jnp.arange(49, 43, -1)
    slots = jnp.zeros((6,), jnp.int32)
    img, key, buf = ddpm_scan_segment(denoise, sched, img, key, None, ts, slots)
    return img
jf = jax.jit(seg)
img0 = jax.random.normal(key, x.shape, jnp.float32)
out = jf(v16, x, g, img0, key); float(jnp.sum(out.astype(jnp.float32)))
t0=time.perf_counter(); out = jf(v16, x, g, img0, key); float(jnp.sum(out.astype(jnp.float32)))
print('6-step seg: %.1f ms/step' % ((time.perf_counter()-t0)/6*1e3), flush=True)
