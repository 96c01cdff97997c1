"""Full-model denoiser step time for AKGM dispatch configs x dtypes."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import ucdir_tpu.ops.akgm as akgm_mod
from ucdir_tpu.models.dy3h import DY3h

key = jax.random.PRNGKey(0)
N = 10

def bench(tag, dt, use_pallas, split):
    akgm_mod._SPLIT = split
    orig = akgm_mod.akgm_mix
    m = DY3h(in_channel=6, out_channel=3, inner_channel=64,
             channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
             dropout=0.0, norm_groups=1, image_size=128,
             use_pallas=use_pallas)
    xin = jax.random.normal(key, (1, 640, 640, 6), dt)
    nl = jnp.full((1, 1), 0.5, dt)
    gd = jax.random.normal(key, (1, 640, 640, 3), dt)
    v = jax.eval_shape(m.init, {'params': key, 'dropout': key}, xin, nl, gd)
    v = jax.tree_util.tree_map(lambda a: jax.random.normal(key, a.shape, dt) * 0.05, v)
    def f(v, x, nl, g):
        def step6(c, _):
            y = m.apply(v, c, nl, g)
            return jnp.concatenate([c[..., :3], y.astype(dt)], axis=-1), None
        return jax.lax.scan(step6, x, None, length=N)[0]
    jf = jax.jit(f)
    out = jf(v, xin, nl, gd); float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = jf(v, xin, nl, gd); float(jnp.sum(out.astype(jnp.float32)))
    print('%-34s %7.1f ms/step' % (tag, (time.perf_counter()-t0)/N*1e3), flush=True)

import functools
_orig_mix = akgm_mod.akgm_mix
def patched_mix(split):
    def mix(h, att, k, b, nset, use_pallas=False):
        return _orig_mix(h, att, k, b, nset, use_pallas=use_pallas,
                         split_channels=split)
    return mix

for dt, dname in [(jnp.bfloat16, 'bf16'), (jnp.float32, 'fp32')]:
    for split, use_pallas, tag in [(10**9, False, 'densified all'),
                                   (256, False, 'small>=256'),
                                   (256, True, 'pallas<=128 + small>=256'),
                                   (10**9, True, 'pallas<=256 + densified512')]:
        akgm_mod.akgm_mix = patched_mix(split)
        import ucdir_tpu.models.akgm as makgm
        makgm.akgm_mix = akgm_mod.akgm_mix
        try:
            bench('%s %s' % (dname, tag), dt, use_pallas, split)
        except Exception as e:
            print('%s %s FAILED: %s' % (dname, tag, str(e)[:150]), flush=True)
