"""Component microbenchmarks for the DY3h denoiser on real TPU hardware."""
import time, functools
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

def _sync(out):
    # device-side reduce + 4-byte fetch: synchronizes without shipping the
    # full buffer over the axon tunnel
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))

def timeit(f, *args, n=5, warmup=2):
    for _ in range(warmup):
        out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n

def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    S, C = 672, 64

    # 1. dense 3x3 conv at full res
    x = jax.random.normal(key, (1, S, S, C), dt)
    w = jax.random.normal(key, (3, 3, C, C), dt) * 0.1
    conv = jax.jit(lambda x, w: jax.lax.conv_general_dilated(
        x, w, (1, 1), 'SAME', dimension_numbers=('NHWC', 'HWIO', 'NHWC')))
    t = timeit(conv, x, w)
    print('conv3x3 %dx%d C=%d: %.2f ms  (%.1f TFLOP/s)' % (
        S, S, C, t * 1e3, 2 * 9 * C * C * S * S / t / 1e12))

    # 2. AKGM XLA path vs pallas at full res
    from ucdir_tpu.ops.akgm import akgm_mix_reference
    from ucdir_tpu.ops.akgm_pallas import akgm_mix_pallas
    G = 8
    att = jax.random.normal(key, (1, S, S, G), dt)
    kg = jax.random.normal(key, (3, 3, C // G, C * G), dt) * 0.1
    bias = jnp.zeros((C * G,), dt)
    ref = jax.jit(functools.partial(akgm_mix_reference, nset=G))
    t = timeit(ref, x, att, kg, bias)
    print('akgm XLA %dx%d C=%d: %.2f ms (%.1f TFLOP/s)' % (
        S, S, C, t * 1e3, 2 * 9 * C * C * S * S / t / 1e12))
    pal = jax.jit(lambda h, a, k, b: akgm_mix_pallas(h, a, k, b, G))
    try:
        t = timeit(pal, x, att, kg, bias)
        print('akgm PALLAS %dx%d C=%d: %.2f ms (%.1f TFLOP/s)' % (
            S, S, C, t * 1e3, 2 * 9 * C * C * S * S / t / 1e12))
    except Exception as e:
        print('akgm pallas FAILED:', type(e).__name__, str(e)[:500])

    # also at deep scale
    S2, C2 = 84, 512
    x2 = jax.random.normal(key, (1, S2, S2, C2), dt)
    att2 = jax.random.normal(key, (1, S2, S2, G), dt)
    kg2 = jax.random.normal(key, (3, 3, C2 // G, C2 * G), dt) * 0.1
    bias2 = jnp.zeros((C2 * G,), dt)
    t = timeit(ref, x2, att2, kg2, bias2)
    print('akgm XLA %dx%d C=%d: %.2f ms' % (S2, S2, C2, t * 1e3))
    try:
        t = timeit(pal, x2, att2, kg2, bias2)
        print('akgm PALLAS %dx%d C=%d: %.2f ms' % (S2, S2, C2, t * 1e3))
    except Exception as e:
        print('akgm pallas deep FAILED:', type(e).__name__, str(e)[:300])

    # 3. attention at 84^2, C=512
    from ucdir_tpu.models.attention import SelfAttention
    m = SelfAttention(in_channel=C2, norm_groups=1)
    xa = jax.random.normal(key, (1, S2, S2, C2), dt)
    v = jax.jit(m.init)(key, xa)
    f = jax.jit(lambda v, x: m.apply(v, x))
    t = timeit(f, v, xa)
    print('attention %dx%d C=%d: %.2f ms' % (S2, S2, C2, t * 1e3))

    # 4. guide resize like AKGM does
    g = jax.random.normal(key, (1, S, S, 3), dt)
    rs = jax.jit(lambda g: jax.image.resize(g, (1, S2, S2, 3), 'bilinear',
                                            antialias=False))
    t = timeit(rs, g)
    print('guide resize %d->%d: %.2f ms' % (S, S2, t * 1e3))

    # 5. groupnorm(1) at full res
    from flax import linen as nn
    gn = nn.GroupNorm(num_groups=1, epsilon=1e-5)
    vg = jax.jit(gn.init)(key, x)
    f = jax.jit(lambda v, x: gn.apply(v, x))
    t = timeit(f, vg, x)
    print('groupnorm %dx%d C=%d: %.2f ms' % (S, S, C, t * 1e3))

    # 6. full denoiser fwd at 672^2 (sid config), bf16
    from ucdir_tpu.models.dy3h import DY3h
    m = DY3h(in_channel=6, out_channel=3, inner_channel=64,
             channel_mults=(1, 2, 4, 8, 8), attn_res=(16,), res_blocks=2,
             dropout=0.1, norm_groups=1, image_size=128)
    xin = jax.random.normal(key, (1, 640, 640, 6), dt)
    nl = jnp.full((1, 1), 0.5, dt)
    gd = jax.random.normal(key, (1, 640, 640, 3), dt)
    vfull = jax.eval_shape(m.init, {'params': key, 'dropout': key}, xin, nl, gd)
    vfull = jax.tree_util.tree_map(
        lambda a: (jax.random.normal(key, a.shape, dt) * 0.05), vfull)
    f = jax.jit(lambda v, x, nl, g: m.apply(v, x, nl, g))
    t = timeit(f, vfull, xin, nl, gd, n=3, warmup=1)
    print('full DY3h fwd 640^2 bf16: %.1f ms' % (t * 1e3))

if __name__ == '__main__':
    main()
