"""Benchmark AKGM formulations on TPU: grouped conv, densified conv, G small convs."""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

key = jax.random.PRNGKey(0)
import sys as _sys
dt = jnp.float32 if "--fp32" in _sys.argv else jnp.bfloat16
N = 20

def bench(name, f, *args):
    jf = jax.jit(lambda *a: jax.lax.scan(lambda c, _: (f(*a[:-1], c), None), a[-1], None, length=N)[0])
    out = jf(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = jf(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print('%-22s %7.2f ms' % (name, (time.perf_counter()-t0)/N*1e3), flush=True)

def grouped(att, kernel, bias, h):
    G = 8
    b, H, W, C = h.shape
    y = lax.conv_general_dilated(h, kernel, (1,1), ((1,1),(1,1)),
        dimension_numbers=('NHWC','HWIO','NHWC'), feature_group_count=G) + bias
    y = y.reshape(b, H, W, C, G)
    return jnp.einsum('bhwcj,bhwj->bhwc', y, att)

def densified(att, kernel, bias, h):
    G = 8
    b, H, W, C = h.shape
    cg = C // G
    # zero-expanded dense kernel (3,3,C,C*G)
    kd = jnp.zeros((3, 3, C, C * G), kernel.dtype)
    for g in range(G):
        kd = kd.at[:, :, g*cg:(g+1)*cg, g*C:(g+1)*C].set(kernel[:, :, :, g*C:(g+1)*C])
    y = lax.conv_general_dilated(h, kd, (1,1), ((1,1),(1,1)),
        dimension_numbers=('NHWC','HWIO','NHWC')) + bias
    y = y.reshape(b, H, W, C, G)
    return jnp.einsum('bhwcj,bhwj->bhwc', y, att)

def smallconvs(att, kernel, bias, h):
    G = 8
    b, H, W, C = h.shape
    cg = C // G
    outs = []
    for g in range(G):
        kg = kernel[:, :, :, g*C:(g+1)*C]            # (3,3,cg,C)
        hg = h[..., g*cg:(g+1)*cg]
        yg = lax.conv_general_dilated(hg, kg, (1,1), ((1,1),(1,1)),
            dimension_numbers=('NHWC','HWIO','NHWC')) + bias[g*C:(g+1)*C]
        yg = yg.reshape(b, H, W, cg, G)
        outs.append(jnp.einsum('bhwcj,bhwj->bhwc', yg, att))
    return jnp.concatenate(outs, axis=-1)

def pallas_fused(att, kernel, bias, h):
    from ucdir_tpu.ops.akgm_pallas import akgm_mix_pallas
    return akgm_mix_pallas(h, att, kernel, bias, 8)

for (S, C) in [(672, 64), (336, 128), (168, 256), (84, 512)]:
    G = 8
    h = jax.random.normal(key, (1, S, S, C), dt)
    att = jax.random.normal(key, (1, S, S, G), dt)
    kernel = jax.random.normal(key, (3, 3, C // G, C * G), dt) * 0.1
    bias = jnp.zeros((C * G,), dt)
    print('--- %dx%d C=%d' % (S, S, C), flush=True)
    for name, f in [('grouped+einsum', grouped), ('densified conv', densified),
                    ('8 small convs', smallconvs), ('pallas fused', pallas_fused)]:
        try:
            bench(name, f, att, kernel, bias, h)
        except Exception as e:
            print('%-22s FAILED %s: %s' % (name, type(e).__name__, str(e)[:200]), flush=True)
