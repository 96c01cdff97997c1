"""Train-step throughput A/B on real TPU: pallas kernels + remat policy.

Usage: python tools/train_bench.py [pallas|xla] [remat|noremat] [B] [S]

Times the full jitted train step (fwd+bwd+opt+EMA) on the sid config's model
at batch B (default 8) and crop S (default 256), bf16 compute. r2 baseline:
xla 0.508 s/step, pallas-under-full-remat 0.589 (pallas lost — kernels were
re-run in backward). The save_only_these_names('pallas_out') policy saves
kernel outputs instead; this measures whether pallas now wins training.
`noremat` disables per-block gradient checkpointing entirely (VERDICT r3
item 5: with hand-written bwd kernels the memory argument changed — measure
whether the recompute is still worth it at this batch/crop).
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from ucdir_tpu.config import parse
from ucdir_tpu.models.factory import define_G
from ucdir_tpu.schedule import make_schedule
from ucdir_tpu.train.step import make_train_step
from ucdir_tpu.train.state import create_train_state
from ucdir_tpu.train.optim import make_optimizer


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else 'pallas'
    remat = (sys.argv[2] if len(sys.argv) > 2 else 'remat') != 'noremat'
    B = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    S = int(sys.argv[4]) if len(sys.argv) > 4 else 256
    cfg = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='train', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=(mode == 'pallas'), remat=remat)
    sched = make_schedule(opt['model']['beta_schedule']['train'])
    key = jax.random.PRNGKey(0)
    batch = {'HR': jax.random.uniform(key, (B, S, S, 3), jnp.float32, -1, 1),
             'SR': jax.random.uniform(key, (B, S, S, 3), jnp.float32, -1, 1)}
    x0 = batch['HR'][:1, :64, :64]
    variables = jax.jit(module.init)(
        {'params': key, 'dropout': key}, {'HR': x0, 'SR': x0},
        jnp.ones((1, 1), jnp.float32) * 0.5, jnp.zeros_like(x0))
    tx = make_optimizer({'type': 'adamw', 'lr': 1e-4})
    state = create_train_state(variables['params'], tx,
                               opt['train'].get('ema_scheduler'))
    step = make_train_step(module, sched, compute_dtype=jnp.bfloat16,
                           donate=False)
    t0 = time.time()
    state2, m = step(state, batch, key)
    print('# loss', float(m['l_pix']), 'compile+first %.1fs' % (time.time() - t0))
    n = 10
    t0 = time.time()
    for i in range(n):
        state2, m = step(state, batch, jax.random.fold_in(key, i))
    # axon: block_until_ready lies for big programs; force with a scalar fetch
    _ = float(m['l_pix'])
    dt = (time.time() - t0) / n
    # hw MFU from XLA's own cost analysis of the compiled step (counts the
    # program as scheduled: remat recompute + densified-AKGM waste included);
    # peaks per CLAUDE.md r3 roofline (spec 197 TF/s bf16, measured ~121).
    mfu = ''
    try:
        ca = step.lower(state, batch, key).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        fl = float(ca.get('flops', 0.0))
        if fl > 0:
            mfu = (' | %.0f GFLOP/step, hw MFU %.1f%% of spec '
                   '(%.1f%% of measured 121 TF/s)'
                   % (fl / 1e9, 100 * fl / dt / 197e12,
                      100 * fl / dt / 121e12))
    except Exception as e:  # cost_analysis is backend-dependent
        mfu = ' | cost_analysis unavailable (%s)' % type(e).__name__
    print('%s%s B=%d S=%d: %.4f s/step (%.2f img/s)%s'
          % (mode, '' if remat else '-noremat', B, S, dt, B / dt, mfu))


if __name__ == '__main__':
    main()
