"""Ablation timing: scan-of-N denoiser calls with components toggled."""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from ucdir_tpu.models.dy3h import DY3h

key = jax.random.PRNGKey(0)
dt = jnp.bfloat16
N = 10

def bench(name, m, size=1024, in_ch=6):
    xin = jax.random.normal(key, (1, size, size, in_ch), dt)
    nl = jnp.full((1, 1), 0.5, dt)
    gd = jax.random.normal(key, (1, size, size, 3), dt)
    v = jax.eval_shape(m.init, {'params': key, 'dropout': key}, xin, nl, gd)
    v = jax.tree_util.tree_map(lambda a: jax.random.normal(key, a.shape, dt) * 0.05, v)

    def f(v, x, nl, g):
        def step(c, _):
            return m.apply(v, c, nl, g)[..., :3].astype(dt), None
        # feed output back (3ch) + cond (3ch) to keep shapes
        def step6(c, _):
            y = m.apply(v, c, nl, g)
            c = jnp.concatenate([c[..., :3], y.astype(dt)], axis=-1)
            return c, None
        c, _ = jax.lax.scan(step6, x, None, length=N)
        return c
    jf = jax.jit(f)
    out = jf(v, xin, nl, gd)
    float(jnp.sum(out.astype(jnp.float32)))  # warmup+sync
    t0 = time.perf_counter()
    out = jf(v, xin, nl, gd)
    float(jnp.sum(out.astype(jnp.float32)))
    dtime = (time.perf_counter() - t0) / N
    print('%-28s %7.1f ms/step' % (name, dtime * 1e3), flush=True)

common = dict(in_channel=6, out_channel=3, inner_channel=64,
              channel_mults=(1, 2, 4, 8, 8), res_blocks=2, dropout=0.0,
              norm_groups=1, image_size=128)
bench('full (attn+AKGM)', DY3h(attn_res=(16,), **common))
bench('no attention', DY3h(attn_res=(), **common))
bench('plain ResnetBlock (no AKGM)', DY3h(attn_res=(16,), resname='ResnetBlock', **{**common, 'norm_groups': 32}))
bench('no attn + no AKGM', DY3h(attn_res=(), resname='ResnetBlock', **{**common, 'norm_groups': 32}))
