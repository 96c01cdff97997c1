"""Round-2 AKGM formulation sweep on real TPU (true-FLOP XLA forms).

The densified path burns G=8x FLOPs; the Pallas kernel avoids the HBM
candidate round-trip but also uses the zero-expanded weights and runs the
MXU at ~6% useful. Speed-of-light for the op at 1024^2/C=64 bf16 is
~0.5 ms (true FLOPs 77 GF -> 0.4 ms @ 197 TF/s; h+out HBM ~0.34 ms).

New forms measured here:
  * batch_group  — move groups to the conv batch dim (batch_group_count=G):
                   true FLOPs, one transpose of h.
  * patches_bmm  — im2col (conv_general_dilated_patches) + G-batched matmul
                   with K=9*cg contraction: true FLOPs, one 9x intermediate.
Both produce the group-major candidate order and apply the reference's
(C, G) view for the attention mix (see ops/akgm.py docstring).

Usage: python tools/akgm_variants2.py [--fp32] [--sizes 1024,64 512,128 ...]
"""
import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax
import numpy as np

key = jax.random.PRNGKey(0)
dt = jnp.float32 if "--fp32" in sys.argv else jnp.bfloat16
N = 20
G = 8


def bench(name, f, att, kernel, bias, h, true_gflops):
    jf = jax.jit(lambda att, kernel, bias, h: lax.scan(
        lambda c, _: (f(att, kernel, bias, c), None), h, None, length=N)[0])
    out = jf(att, kernel, bias, h)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = jf(att, kernel, bias, h)
    float(jnp.sum(out.astype(jnp.float32)))
    ms = (time.perf_counter() - t0) / N * 1e3
    print('%-16s %7.2f ms  (%5.1f useful TFLOP/s)' % (
        name, ms, true_gflops / ms), flush=True)
    return ms


def mix(hset_flat, att):
    """Reference (C, G) view mix: flat group-major candidates -> out."""
    b, H, W, CG = hset_flat.shape
    C = CG // G
    hset = hset_flat.reshape(b, H, W, C, G)
    return jnp.einsum('bhwcj,bhwj->bhwc', hset, att,
                      preferred_element_type=hset.dtype)


def densified(att, kernel, bias, h):
    from ucdir_tpu.ops.akgm import akgm_mix_densified
    return akgm_mix_densified(h, att, kernel, bias, G)


def smallconvs(att, kernel, bias, h):
    from ucdir_tpu.ops.akgm import akgm_mix_smallconvs
    return akgm_mix_smallconvs(h, att, kernel, bias, G)


def pallas_fused(att, kernel, bias, h):
    from ucdir_tpu.ops.akgm_pallas import akgm_mix_pallas
    return akgm_mix_pallas(h, att, kernel, bias, G)


def batch_group(att, kernel, bias, h):
    from ucdir_tpu.ops.akgm import akgm_mix_batchgroup
    return akgm_mix_batchgroup(h, att, kernel, bias, G)


def patches_bmm(att, kernel, bias, h):
    from ucdir_tpu.ops.akgm import akgm_mix_patches
    return akgm_mix_patches(h, att, kernel, bias, G)


def main():
    sizes = [(1024, 64), (512, 128), (256, 256), (128, 512), (672, 64)]
    if '--sizes' in sys.argv:
        i = sys.argv.index('--sizes')
        sizes = [tuple(map(int, s.split(','))) for s in sys.argv[i + 1:]]
    from ucdir_tpu.ops.akgm import akgm_mix_reference
    for (S, C) in sizes:
        h = jax.random.normal(key, (1, S, S, C), dt)
        att = jax.random.normal(key, (1, S, S, G), dt)
        kernel = jax.random.normal(key, (3, 3, C // G, C * G), dt) * 0.1
        bias = jnp.zeros((C * G,), dt)
        true_gflops = (2 * 9 * S * S * (C // G) * C * G      # grouped conv
                       + 2 * S * S * C * G) / 1e9            # mix
        print('--- %dx%d C=%d (true %.1f GFLOP, SOL ~%.2f ms)' % (
            S, S, C, true_gflops,
            max(true_gflops / 197e3,
                (2 * S * S * C + S * S * G) * dt.dtype.itemsize * 2 / 819e9
                * 1e3)), flush=True)
        # correctness vs reference first (small slice, fp32)
        hs = jax.random.normal(key, (1, 16, 16, C), jnp.float32)
        as_ = jax.random.normal(key, (1, 16, 16, G), jnp.float32)
        ks = kernel.astype(jnp.float32)
        bs = jax.random.normal(key, (C * G,), jnp.float32)
        want = akgm_mix_reference(hs, as_, ks, bs, G)
        for name, f in [('batch_group', batch_group),
                        ('patches_bmm', patches_bmm)]:
            got = f(as_, ks, bs, hs)
            err = float(jnp.max(jnp.abs(got - want)))
            if err > 1e-3:
                print('%-16s WRONG max|err|=%.2e' % (name, err), flush=True)
        for name, f in [('densified', densified),
                        ('smallconvs', smallconvs),
                        ('batch_group', batch_group),
                        ('patches_bmm', patches_bmm),
                        ('pallas', pallas_fused)]:
            try:
                bench(name, f, att, kernel, bias, h, true_gflops)
            except Exception as e:
                print('%-16s FAILED %s: %s' % (
                    name, type(e).__name__, str(e)[:160]), flush=True)


if __name__ == '__main__':
    main()
