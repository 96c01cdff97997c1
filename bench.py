"""Benchmark: SID val-path sampling throughput on real TPU hardware.

Measures the north-star metric (BASELINE.json): images/sec/chip for the full
50-step EMA sampling path (predictor + 50 guided DY3h denoiser calls as one
lax.scan) on a 512x512 input — the whole reverse process is one XLA program.

The reference has no published numbers (BASELINE.md): vs_baseline is reported
against `BENCH_BASELINE.json` (this repo's first recorded TPU run) so later
rounds show the speedup trend; on the very first run it is 1.0 and the file is
written.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'BENCH_BASELINE.json')


def main():
    import jax
    import jax.numpy as jnp

    from ucdir_tpu.config import parse
    from ucdir_tpu.models.factory import define_G
    from ucdir_tpu.schedule import make_schedule
    from ucdir_tpu.diffusion.sampler import super_resolution

    cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=False)
    sched = make_schedule(opt['model']['beta_schedule']['val'])  # 50 steps, 0.4

    key = jax.random.PRNGKey(0)
    b, s = 1, 512
    x = jax.random.uniform(key, (b, s, s, 3), jnp.float32, -1, 1)

    # random-init weights: throughput is checkpoint-independent
    init_x = {'HR': x, 'SR': x}
    variables = jax.jit(module.init)(
        {'params': key, 'dropout': key}, init_x,
        jnp.ones((b, 1), jnp.float32) * 0.5, jnp.zeros_like(x))

    def run(compute_dtype, n_iters=3):
        f = jax.jit(lambda v, x, k: super_resolution(
            module, v, sched, x, k, compute_dtype=compute_dtype)[0])
        t0 = time.time()
        out = f(variables, x, key)
        out.block_until_ready()
        compile_t = time.time() - t0
        t0 = time.time()
        for i in range(n_iters):
            out = f(variables, x, jax.random.fold_in(key, i))
        out.block_until_ready()
        return (time.time() - t0) / n_iters, compile_t, out

    dt32, c32, out32 = run(None)
    dt16, c16, out16 = run(jnp.bfloat16)
    # bf16 sanity: trajectories should agree closely (same keys, same weights)
    dev = float(jnp.mean(jnp.abs(out16 - out32)))
    use_bf16 = dev < 0.05
    dt = dt16 if use_bf16 else dt32
    compile_and_first = c16 if use_bf16 else c32
    images_per_sec = b / dt

    vs_baseline = 1.0
    if os.path.exists(BASELINE_FILE):
        try:
            with open(BASELINE_FILE) as fh:
                base = json.load(fh)['value']
            vs_baseline = images_per_sec / base
        except Exception:
            pass
    else:
        with open(BASELINE_FILE, 'w') as fh:
            json.dump({'value': images_per_sec,
                       'note': 'first recorded TPU run (round 1); '
                               'vs_baseline in later rounds is relative to this'},
                      fh)

    print(json.dumps({
        'metric': 'sid_val_50step_512px_images_per_sec_per_chip',
        'value': round(images_per_sec, 5),
        'unit': 'images/sec/chip',
        'vs_baseline': round(vs_baseline, 4),
    }))
    print('# compile+first: %.1fs; per image fp32 %.3fs, bf16 %.3fs; '
          'bf16 mean|dev| vs fp32: %.4f (headline dtype: %s)'
          % (compile_and_first, dt32, dt16, dev,
             'bf16' if use_bf16 else 'fp32'), file=sys.stderr)


if __name__ == '__main__':
    main()
