"""Real-TPU parity + timing for the fused Pallas backward kernels.

Compares _akgm_block_backward / _conv3x3_backward against the XLA-composition
vjp (the previous custom_vjp backward) at train-crop shapes, then times both
in a lax.scan (>=10 iters amortizes the ~7ms axon dispatch overhead).

Usage: python tools/bwd_parity.py [akgm|conv|both] [S] [C]
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import numpy as np

from ucdir_tpu.ops.akgm_pallas import (_akgm_block_backward, _block_ref)
from ucdir_tpu.ops.conv_pallas import _conv3x3_backward, _c3_ref


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0][:1, :1]
                         .astype(jnp.float32)))


def _time_scan(fn, args, n=10):
    def body(c, _):
        out = fn(*args)
        return c + jax.tree_util.tree_leaves(out)[0][:1, :1, :1, :1] \
            .astype(jnp.float32).reshape(()), None
    f = jax.jit(lambda: jax.lax.scan(body, jnp.zeros(()), None, length=n)[0])
    _sync(f())
    t0 = time.time()
    _sync(f())
    return (time.time() - t0) / n * 1e3


def check_akgm(S=256, C=64, G=8, B=2):
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    h, att = mk(B, S, S, C), mk(B, S, S, G)
    k, b = mk(3, 3, C // G, C * G) * 0.1, mk(C * G) * 0.1
    res, g = mk(B, S, S, C), mk(B, S, S, C)
    ns, nt, aw = mk(B, C) + 1., mk(B, C), mk(B, G) + 1.

    _, vjp = jax.vjp(lambda *xs: _block_ref(*xs[:5], G, *xs[5:]),
                     h, att, k, b, res, ns, nt, aw)
    want = vjp(g)
    got = jax.jit(lambda *xs: _akgm_block_backward(*xs[:5], xs[5], G,
                                                   *xs[6:]))(
        h, att, k, b, res, g, ns, nt, aw)
    names = ['dh', 'datt', 'dk', 'dbias', 'dres', 'dns', 'dnt', 'daw']
    for w_, g_, n_ in zip(want, got, names):
        d = float(jnp.max(jnp.abs(g_ - w_)) / (jnp.max(jnp.abs(w_)) + 1e-8))
        print(f'  akgm {n_}: rel maxdiff {d:.2e}')
        assert d < 3e-3, (n_, d)
    print(f'akgm S={S} C={C} f32 parity OK')

    cd = jnp.bfloat16
    a16 = [x.astype(cd) for x in (h, att, k, b, res, g)]
    ns16, nt16, aw16 = ns.astype(cd), nt.astype(cd), aw.astype(cd)
    tp = _time_scan(lambda *xs: _akgm_block_backward(
        *xs[:5], xs[5], G, *xs[6:]), (*a16, ns16, nt16, aw16))

    def xla_bwd(h, att, k, b, res, g, ns, nt, aw):
        _, vjp = jax.vjp(lambda *xs: _block_ref(*xs[:5], G, *xs[5:]),
                         h, att, k, b, res, ns, nt, aw)
        return vjp(g)
    tx = _time_scan(xla_bwd, (*a16, ns16, nt16, aw16))
    print(f'akgm bwd S={S} C={C} B={B} bf16: pallas {tp:.2f} ms  '
          f'xla-comp {tx:.2f} ms  (x{tx / tp:.2f})')


def check_conv(S=256, Cin=64, Cout=64, B=2, act='swish'):
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.3, jnp.float32)
    x, k, b = mk(B, S, S, Cin), mk(3, 3, Cin, Cout) * 0.1, mk(Cout) * 0.1
    g = mk(B, S, S, Cout)
    ns, nt = mk(B, Cin) + 1., mk(B, Cin)

    _, vjp = jax.vjp(lambda *xs: _c3_ref(xs[0], xs[1], xs[2], act, xs[3],
                                         xs[4]), x, k, b, ns, nt)
    want = vjp(g)
    got = jax.jit(lambda *xs: _conv3x3_backward(xs[0], xs[1], xs[2], xs[3],
                                                act, xs[4], xs[5]))(
        x, k, b, g, ns, nt)
    for w_, g_, n_ in zip(want, got, ['dx', 'dk', 'dbias', 'dns', 'dnt']):
        d = float(jnp.max(jnp.abs(g_ - w_)) / (jnp.max(jnp.abs(w_)) + 1e-8))
        print(f'  conv {n_}: rel maxdiff {d:.2e}')
        assert d < 3e-3, (n_, d)
    print(f'conv S={S} {Cin}->{Cout} f32 parity OK')

    cd = jnp.bfloat16
    a16 = [t.astype(cd) for t in (x, k, b, g, ns, nt)]
    tp = _time_scan(lambda *xs: _conv3x3_backward(
        xs[0], xs[1], xs[2], xs[3], act, xs[4], xs[5]), a16)

    def xla_bwd(x, k, b, g, ns, nt):
        _, vjp = jax.vjp(lambda *xs: _c3_ref(xs[0], xs[1], xs[2], act,
                                             xs[3], xs[4]), x, k, b, ns, nt)
        return vjp(g)
    tx = _time_scan(xla_bwd, a16)
    print(f'conv bwd S={S} {Cin}->{Cout} B={B} bf16: pallas {tp:.2f} ms  '
          f'xla-comp {tx:.2f} ms  (x{tx / tp:.2f})')


if __name__ == '__main__':
    what = sys.argv[1] if len(sys.argv) > 1 else 'both'
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    if what in ('akgm', 'both'):
        check_akgm(S=S, C=C)
    if what in ('conv', 'both'):
        check_conv(S=S, Cin=C, Cout=C)
