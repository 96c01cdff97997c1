"""A/B the group-packed (v3) fused AKGM block tail against v2 + XLA on TPU.

Usage: python tools/akgm_packed_bench.py [C ...]  (default 64 128 256)
Correctness vs the XLA reference composition, then scan-amortized timing.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(C, S=1024, dtype=jnp.bfloat16, fold=True, iters=10):
    from ucdir_tpu.ops import akgm_pallas as ap
    G = 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    h = jax.random.normal(ks[0], (1, S, S, C), dtype)
    att = jax.random.normal(ks[1], (1, S, S, G), dtype) * 0.3
    kernel = jax.random.normal(ks[2], (3, 3, C // G, C * G), jnp.float32) * 0.05
    bias = jax.random.normal(ks[3], (C * G,), jnp.float32) * 0.1
    res = jax.random.normal(ks[4], (1, S, S, C), dtype)
    attw = jax.random.normal(ks[5], (1, G), dtype) * 0.5
    if fold:
        ns = (jax.random.normal(ks[6], (1, C), jnp.float32) * 0.2 + 1.)
        nt = jax.random.normal(ks[7], (1, C), jnp.float32) * 0.1
        ns, nt = ns.astype(dtype), nt.astype(dtype)
    else:
        ns = nt = None

    ref = jax.jit(lambda *a: ap._block_ref(*a, nset=G, norm_scale=ns,
                                           norm_shift=nt, attw=attw))(
        h, att, kernel.astype(dtype), bias.astype(dtype), res)

    outs = {}
    for name, env in (('v2', '0'), ('v3-packed', '1')):
        os.environ['UCDIR_TPU_AKGM_PACKED'] = env

        def run(h, att, k, b, r):
            def body(c, _):
                o = ap.akgm_block_pallas(h + c * 0, att, k, b, r, G,
                                         norm_scale=ns, norm_shift=nt,
                                         attw=attw)
                return c, o
            _, os_ = jax.lax.scan(body, jnp.zeros((), h.dtype),
                                  jnp.arange(iters))
            return os_[-1]

        f = jax.jit(run)
        args = (h, att, kernel.astype(dtype), bias.astype(dtype), res)
        t0 = time.time(); out = f(*args); jax.block_until_ready(out)
        compile_t = time.time() - t0
        t0 = time.time(); out = f(*args); jax.block_until_ready(out)
        dt = (time.time() - t0) / iters
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        scale = float(jnp.max(jnp.abs(ref.astype(jnp.float32)))) or 1.0
        outs[name] = (dt, err / scale)
        print('C=%d %s: %.3f ms/call  rel-err %.2e  (compile %.0fs)'
              % (C, name, dt * 1e3, err / scale, compile_t), flush=True)
    if 'v2' in outs and 'v3-packed' in outs:
        print('C=%d packed speedup: x%.2f' % (C, outs['v2'][0] /
                                              outs['v3-packed'][0]),
              flush=True)


if __name__ == '__main__':
    cs = [int(a) for a in sys.argv[1:]] or [64, 128, 256]
    for C in cs:
        bench(C, S=1024 if C <= 128 else 256)
