"""A/B the full DY3h forward at tile size: pallas AKGM vs XLA dispatch (bf16).

Also accepts UCDIR_TPU_AKGM_FORM to force an XLA formulation in the 'xla' arm.
Usage: python tools/inmodel_pallas_ab.py [size] [n_steps]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from ucdir_tpu.models.dy3h import DY3h

key = jax.random.PRNGKey(0)
dt = jnp.bfloat16
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
N = int(sys.argv[2]) if len(sys.argv) > 2 else 10

common = dict(in_channel=6, out_channel=3, inner_channel=64,
              channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
              dropout=0.0, norm_groups=1, image_size=128)


def bench(name, m):
    xin = jax.random.normal(key, (1, SIZE, SIZE, 6), dt)
    nl = jnp.full((1, 1), 0.5, dt)
    gd = jax.random.normal(key, (1, SIZE, SIZE, 3), dt)
    v = jax.eval_shape(m.init, {'params': key, 'dropout': key}, xin, nl, gd)
    v = jax.tree_util.tree_map(
        lambda a: jax.random.normal(key, a.shape, dt) * 0.05, v)

    def f(v, x, nl, g):
        def step6(c, _):
            y = m.apply(v, c, nl, g)
            return jnp.concatenate([c[..., :3], y.astype(dt)], axis=-1), None
        return jax.lax.scan(step6, x, None, length=N)[0]
    jf = jax.jit(f)
    out = jf(v, xin, nl, gd)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = jf(v, xin, nl, gd)
    float(jnp.sum(out.astype(jnp.float32)))
    print('%-26s %7.1f ms/step' % (name, (time.perf_counter() - t0) / N * 1e3),
          flush=True)


bench('xla dispatch (r1)', DY3h(use_pallas=False, **common))
bench('pallas C<=128', DY3h(use_pallas=True, **common))
