"""512px whole-image bench leg (bench.py's secondary metric program).

Usage: python tools/ab512.py [tag] [n_steps] [n_iters]

Builds EXACTLY bench.py's 512px program (pad=0, bf16, sid val schedule but
with n_steps for faster A/B) and prints s/img + img/s. Env knobs
(UCDIR_TPU_*) are applied by the caller per leg — see tools/ab512_run.sh
for the round-4 regression bisect matrix (VERDICT r3 item 2).
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
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    it = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    key = jax.random.PRNGKey(0)
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=os.environ.get(
        'UCDIR_TPU_PALLAS', '1') == '1')
    so = dict(opt['model']['beta_schedule']['val'])
    so['n_timestep'] = n
    sched = make_schedule(so)
    x0 = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32, -1, 1)
    v = jax.jit(module.init)({'params': key, 'dropout': key},
                             {'HR': x0, 'SR': x0},
                             jnp.ones((1, 1), jnp.float32) * 0.5,
                             jnp.zeros_like(x0))
    x = jax.random.uniform(key, (1, 512, 512, 3), jnp.float32, -1, 1)
    ev = make_eval_step(module, sched, pad=0, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    out = ev(v, x, key)
    s = float(jnp.sum(out[0].astype(jnp.float32)[:1, :1, :8]))
    print('# compile+first %.1fs (sum %.3f)' % (time.perf_counter() - t0, s),
          flush=True)
    t0 = time.perf_counter()
    for _ in range(it):
        out = ev(v, x, key)
    float(jnp.sum(out[0].astype(jnp.float32)[:1, :1, :8]))
    dt = (time.perf_counter() - t0) / it
    print('AB512 %s: %.2f ms/step, %.3f s/img-extrap-50step (%.4f img/s)'
          % (tag, dt / n * 1e3, dt / n * 50, 1.0 / (dt / n * 50)), flush=True)


if __name__ == '__main__':
    main()
