"""On-hardware parity of chained GroupNorm(1) stats vs the unchained path.

Runs the integrated SID eval program (3-step schedule, bf16) twice — once
with UCDIR_TPU_CHAIN_STATS=0 (every folded norm re-reads its input) and once
with the default kernel-emitted chained totals — same key, and prints the
device-side max|diff|. The chained totals are f32 sums of the STORED kernel
outputs, so the two programs should agree to bf16 rounding of the
accumulation order (expected << 1e-2 on [-1,1] images; 'xla'-mode CPU test
in tests/test_chain_stats.py proves the threading algebra exactly).
"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train.step import make_eval_step


def build_and_run(mode, x, key):
    os.environ['UCDIR_TPU_CHAIN_STATS'] = mode
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=True)
    so = dict(opt['model']['beta_schedule']['val'])
    so['n_timestep'] = 3
    sched = make_schedule(so)
    k = jax.random.PRNGKey(0)
    x0 = jax.random.uniform(k, (1, 64, 64, 3), jnp.float32, -1, 1)
    v = jax.jit(module.init)({'params': k, 'dropout': k},
                             {'HR': x0, 'SR': x0},
                             jnp.ones((1, 1), jnp.float32) * 0.5,
                             jnp.zeros_like(x0))
    ev = make_eval_step(module, sched, pad=64, compute_dtype=jnp.bfloat16)
    return ev(v, x, key)[0]


def main():
    # Default is half-SID (712x1064 -> padded 840x1192, /32 -> 864x1216),
    # ~4x faster compile than full SID. Dispatch coverage vs the shipped
    # full-SID program: conv3x3/downconv kernels at /1 (864) and /2 (432,
    # >= MIN_DIM 384) SAME; windowed attention at /8 (108x152 = 16416 >=
    # 16384 tokens) SAME; the C=256 AKGM tail at /4 (216x304 = 65k px)
    # would be area-gated OFF (full SID: ON) — so TAIL_MAX_C is pinned
    # below to force the full-SID decision. Run `python tools/ab_parity.py
    # 1424 2128` for the exact production program at least once per round.
    os.environ.setdefault('UCDIR_TPU_TAIL_MAX_C', '256')
    h = int(sys.argv[1]) if len(sys.argv) > 1 else 712
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 1064
    key = jax.random.PRNGKey(7)
    x = jax.random.uniform(key, (1, h, w, 3), jnp.float32, -1, 1)
    a = build_and_run('0', x, key)
    b = build_and_run('auto', x, key)
    d = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    m = float(jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print('PARITY chain-stats %dx%d: max|diff| %.3e mean %.3e' % (h, w, d, m),
          flush=True)
    assert d < 2e-2, 'chained stats diverge on hardware'


if __name__ == '__main__':
    main()
