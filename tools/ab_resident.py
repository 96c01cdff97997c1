"""Resident vs reassembling tiled eval at real SID size (single chip).

Usage: [UCDIR_TPU_NO_RESIDENT=1] python tools/ab_resident.py [tag] [n_steps]

Builds the REAL segmented CLI eval program (make_eval_step with an explicit
reference tile dict {1024, 64} + seg_steps, bf16) at 1424x2128 and prints
s/denoise-step. UCDIR_TPU_NO_RESIDENT=1 selects the reassembling
(gather -> UNet -> scatter -> full-image posterior) path; default is the
tile-resident scan (parallel/resident.py). r3 measured these neutral
(55.75 vs 55.64 s/img); r4's flat-carry + no-pad-refresh resident should
win (VERDICT r3 items 1+4).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train.step import make_eval_step


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else 'default'
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    h = int(sys.argv[3]) if len(sys.argv) > 3 else 1424
    w = int(sys.argv[4]) if len(sys.argv) > 4 else 2128
    key = jax.random.PRNGKey(0)
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=True)
    so = dict(opt['model']['beta_schedule']['val'])
    so['n_timestep'] = n
    sched = make_schedule(so)
    x0 = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32, -1, 1)
    v = jax.jit(module.init)({'params': key, 'dropout': key},
                             {'HR': x0, 'SR': x0},
                             jnp.ones((1, 1), jnp.float32) * 0.5,
                             jnp.zeros_like(x0))
    x = jax.random.uniform(key, (1, h, w, 3), jnp.float32, -1, 1)
    # force the resident gate (single-chip default is now reassembling);
    # NO_RESIDENT=1 still wins inside the gate for the reassemble leg
    os.environ.setdefault('UCDIR_TPU_RESIDENT', '1')
    ev = make_eval_step(module, sched, pad=64, compute_dtype=jnp.bfloat16,
                        tile={'skip': 1024, 'padding': 64}, seg_steps=n)
    t0 = time.perf_counter()
    out = ev(v, x, key)
    s = float(jnp.sum(out[0].astype(jnp.float32)[:1, :1, :8]))
    print('# compile+first %.1fs (sum %.3f)' % (time.perf_counter() - t0, s),
          flush=True)
    t0 = time.perf_counter()
    out = ev(v, x, key)
    float(jnp.sum(out[0].astype(jnp.float32)[:1, :1, :8]))
    dt = (time.perf_counter() - t0) / n
    print('ABRES %s %dx%d (resident=%s): %.1f ms/step -> ~%.1f s/img@50'
          % (tag, h, w, os.environ.get('UCDIR_TPU_NO_RESIDENT') != '1',
             dt * 1e3, dt * 50), flush=True)


if __name__ == '__main__':
    main()
