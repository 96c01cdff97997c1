"""Integrated SID eval-step timing for dispatch A/Bs.

Usage: python tools/ab_sid.py [n_steps] [h] [w] [tag]

Builds the REAL CLI eval program (train/step.make_eval_step on the sid
config, bf16, 64-px pad — same as trace_ops.py's 'sid' target) on an
n_steps schedule and prints ms/denoise-step. Env knobs (UCDIR_TPU_*) are
applied by the caller; see tools/r3_ab_run.sh for the round-3 matrix.

Sync is a device-side scalar fetch (block_until_ready lies on axon for
scan-heavy programs — CLAUDE.md r3).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
jax.config.update('jax_compilation_cache_dir',
                  os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                 '/root/.cache/jax_comp_cache'))

from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train.step import make_eval_step


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    h = int(sys.argv[2]) if len(sys.argv) > 2 else 1424
    w = int(sys.argv[3]) if len(sys.argv) > 3 else 2128
    tag = sys.argv[4] if len(sys.argv) > 4 else 'default'
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
    x = jax.random.uniform(key, (1, h, w, 3), jnp.float32, -1, 1)
    ev = make_eval_step(module, sched, pad=64, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    out = ev(v, x, key)
    s = float(jnp.sum(out[0].astype(jnp.float32)[:1, :1, :8]))
    print('# compile+first %.1fs (sum %.3f)' % (time.perf_counter() - t0, s),
          flush=True)
    t0 = time.perf_counter()
    out = ev(v, x, key)
    float(jnp.sum(out[0].astype(jnp.float32)[:1, :1, :8]))
    dt = (time.perf_counter() - t0) / n
    print('AB %s %dx%d: %.1f ms/step (%d steps)' % (tag, h, w, dt * 1e3, n),
          flush=True)


if __name__ == '__main__':
    main()
