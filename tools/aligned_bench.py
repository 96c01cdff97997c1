"""A/B the aligned-halo (pipelined DMA) kernels vs the Element-halo ones.

Usage: python tools/aligned_bench.py [conv|akgm|all] [R ...]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(f, *args, iters=10):
    def run(*a):
        def body(c, _):
            return c, f(*a)
        _, outs = jax.lax.scan(body, jnp.zeros(()), jnp.arange(iters))
        return outs[-1]
    g = jax.jit(run)
    t0 = time.time(); out = g(*args); jax.block_until_ready(out)
    ct = time.time() - t0
    t0 = time.time(); out = g(*args); jax.block_until_ready(out)
    return (time.time() - t0) / iters, ct, out


def bench_conv(S, Cin, Cout, R=None, dtype=jnp.bfloat16):
    from ucdir_tpu.ops import conv_pallas as cp
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    x = jax.random.normal(ks[0], (1, S, S, Cin), dtype)
    k = (jax.random.normal(ks[1], (3, 3, Cin, Cout), jnp.float32) * 0.05
         ).astype(dtype)
    b = (jax.random.normal(ks[2], (Cout,), jnp.float32) * 0.1).astype(dtype)
    ns = (jax.random.normal(ks[3], (1, Cin), jnp.float32) * 0.2 + 1.).astype(dtype)
    nt = (jax.random.normal(ks[4], (1, Cin), jnp.float32) * 0.1).astype(dtype)
    ref = jax.jit(lambda *a: cp._c3_ref(*a[:3], 'swish', *a[3:]))(
        x, k, b, ns, nt)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.

    res = {}
    for name, env in (('element', '0'), ('aligned', '1')):
        os.environ['UCDIR_TPU_ALIGNED'] = env
        if R:
            os.environ['UCDIR_TPU_CONV_R'] = str(R)
        dt, ct, out = timed(
            lambda x, k, b, ns, nt: cp.conv3x3_pallas(x, k, b, 'swish',
                                                      ns, nt),
            x, k, b, ns, nt)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))) / scale
        res[name] = dt
        print('conv %d^2 %d->%d %s R=%s: %.3f ms  rel-err %.1e (c %.0fs)'
              % (S, Cin, Cout, name, R or 'def', dt * 1e3, err, ct),
              flush=True)
    print('conv %d^2 %d->%d speedup x%.2f' % (S, Cin, Cout,
                                              res['element'] / res['aligned']),
          flush=True)


def bench_akgm(S, C, R=None, dtype=jnp.bfloat16):
    from ucdir_tpu.ops import akgm_pallas as ap
    G = 8
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 8)
    h = jax.random.normal(ks[0], (1, S, S, C), dtype)
    att = jax.random.normal(ks[1], (1, S, S, G), dtype) * 0.3
    kern = (jax.random.normal(ks[2], (3, 3, C // G, C * G), jnp.float32)
            * 0.05).astype(dtype)
    bias = (jax.random.normal(ks[3], (C * G,), jnp.float32) * 0.1).astype(dtype)
    resid = jax.random.normal(ks[4], (1, S, S, C), dtype)
    attw = jax.random.normal(ks[5], (1, G), dtype) * 0.5
    ns = (jax.random.normal(ks[6], (1, C), jnp.float32) * 0.2 + 1.).astype(dtype)
    nt = (jax.random.normal(ks[7], (1, C), jnp.float32) * 0.1).astype(dtype)
    ref = jax.jit(lambda *a: ap._block_ref(*a[:5], G, norm_scale=a[5],
                                           norm_shift=a[6], attw=a[7]))(
        h, att, kern, bias, resid, ns, nt, attw)
    scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.

    res = {}
    for name, env in (('element', '0'), ('aligned', '1')):
        os.environ['UCDIR_TPU_ALIGNED'] = env
        if R:
            os.environ['UCDIR_TPU_AKGM_R'] = str(R)
        dt, ct, out = timed(
            lambda *a: ap.akgm_block_pallas(*a[:5], G, norm_scale=a[5],
                                            norm_shift=a[6], attw=a[7]),
            h, att, kern, bias, resid, ns, nt, attw)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32)))) / scale
        res[name] = dt
        print('akgm %d^2 C=%d %s R=%s: %.3f ms  rel-err %.1e (c %.0fs)'
              % (S, C, name, R or 'def', dt * 1e3, err, ct), flush=True)
    print('akgm %d^2 C=%d speedup x%.2f' % (S, C,
                                            res['element'] / res['aligned']),
          flush=True)


if __name__ == '__main__':
    what = sys.argv[1] if len(sys.argv) > 1 else 'all'
    rs = [int(a) for a in sys.argv[2:]] or [None]
    for R in rs:
        if what in ('conv', 'all'):
            bench_conv(1024, 192, 64, R)
            bench_conv(1024, 128, 128, R)
        if what in ('akgm', 'all'):
            bench_akgm(1024, 64, R)
            bench_akgm(512, 128, R)
