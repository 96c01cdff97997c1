"""Formulation sweep for the pathological small-channel convs on TPU.

Targets (from tools/trace_ops.py on the C=64 block): the guide branch
(1x1 3->16, gate, 3x3 8->8) costs ~7 ms/block and conv1 (3x3 64->64) ~4.9 ms
at 1024^2 — XLA picks T(2,128)-tiled space-minor conv layouts that pad C=8
to 128 lanes. Candidates: NHWC conv (baseline), im2col+matmul, NCHW conv.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
from jax import lax

key = jax.random.PRNGKey(0)
dt = jnp.bfloat16
N = 20
S = int(sys.argv[1]) if len(sys.argv) > 1 else 1024


def bench(name, f, *args):
    jf = jax.jit(lambda *a: lax.scan(
        lambda c, _: (f(*a[:-1], c), None), a[-1], None, length=N)[0])
    out = jf(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = jf(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print('%-26s %7.2f ms' % (name, (time.perf_counter() - t0) / N * 1e3),
          flush=True)


# ---- guide branch: g(B,S,S,3) -> conv1x1(16) -> gate -> conv3x3(8->8) ------
w0 = jax.random.normal(key, (1, 1, 3, 16), dt) * 0.1
b0 = jnp.zeros((16,), dt)
w2 = jax.random.normal(key, (3, 3, 8, 8), dt) * 0.1
b2 = jnp.zeros((8,), dt)


def gate(x):
    a, b = jnp.split(x, 2, axis=-1)
    return a * b


def guide_nhwc(w0, b0, w2, b2, g):
    y = lax.conv_general_dilated(g, w0, (1, 1), 'VALID',
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b0
    y = gate(y)
    y = lax.conv_general_dilated(y, w2, (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b2
    # keep carry shape (B,S,S,3)
    return jnp.concatenate([y[..., :1]] * 3, axis=-1)


def guide_matmul(w0, b0, w2, b2, g):
    y = jnp.einsum('bhwc,co->bhwo', g, w0[0, 0]) + b0
    y = gate(y)
    p = lax.conv_general_dilated_patches(
        y, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))       # (B,S,S,72) c*9+t
    wm = w2.reshape(9, 8, 8).transpose(1, 0, 2).reshape(72, 8)
    y = jnp.einsum('bhwk,ko->bhwo', p, wm) + b2
    return jnp.concatenate([y[..., :1]] * 3, axis=-1)


def guide_nchw(w0, b0, w2, b2, g):
    gc = g.transpose(0, 3, 1, 2)
    y = lax.conv_general_dilated(gc, w0.transpose(3, 2, 0, 1), (1, 1), 'VALID',
                                 dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    y = y + b0[None, :, None, None]
    a, b = jnp.split(y, 2, axis=1)
    y = a * b
    y = lax.conv_general_dilated(y, w2.transpose(3, 2, 0, 1), (1, 1),
                                 ((1, 1), (1, 1)),
                                 dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    y = (y + b2[None, :, None, None]).transpose(0, 2, 3, 1)
    return jnp.concatenate([y[..., :1]] * 3, axis=-1)


g = jax.random.normal(key, (1, S, S, 3), dt)
print('--- guide branch @%d^2' % S, flush=True)
bench('nhwc convs (current)', guide_nhwc, w0, b0, w2, b2, g)
bench('matmul+patches', guide_matmul, w0, b0, w2, b2, g)
bench('nchw convs', guide_nchw, w0, b0, w2, b2, g)

# ---- conv1: 3x3 C->C at C=64 ------------------------------------------------
C = 64
wc = jax.random.normal(key, (3, 3, C, C), dt) * 0.05
x = jax.random.normal(key, (1, S, S, C), dt)


def conv1_nhwc(wc, x):
    return lax.conv_general_dilated(x, wc, (1, 1), ((1, 1), (1, 1)),
                                    dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def conv1_patches(wc, x):
    p = lax.conv_general_dilated_patches(
        x, (3, 3), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))       # (B,S,S,C*9)
    wm = wc.reshape(9, C, C).transpose(1, 0, 2).reshape(C * 9, C)
    return jnp.einsum('bhwk,ko->bhwo', p, wm)


def conv1_nchw(wc, x):
    xc = x.transpose(0, 3, 1, 2)
    y = lax.conv_general_dilated(xc, wc.transpose(3, 2, 0, 1), (1, 1),
                                 ((1, 1), (1, 1)),
                                 dimension_numbers=('NCHW', 'OIHW', 'NCHW'))
    return y.transpose(0, 2, 3, 1)


print('--- conv3x3 %d->%d @%d^2' % (C, C, S), flush=True)
bench('nhwc conv (current)', conv1_nhwc, wc, x)
bench('patches+matmul', conv1_patches, wc, x)
bench('nchw conv', conv1_nchw, wc, x)
