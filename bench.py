"""Benchmark: SID val-path sampling throughput on real TPU hardware.

Headline = the north-star metric (BASELINE.json): images/sec/chip for the
FULL integrated val path at the real SID test resolution (1424x2128,
/root/reference/config/sid.yaml:31-32) — 64-px reflect pad, 50-step EMA
ancestral sampling, bf16 compute. The whole reverse process runs as a few
scan segments via make_eval_step — exactly what `sr.py -p val` runs per
image.

Also reported (stderr): 512px whole-image sampling (the round-1 headline,
kept for trend), a bf16-vs-fp32 sanity deviation, an MFU estimate from the
compiled HLO's FLOP count against the chip's bf16 peak, and train-step
throughput.

Robustness (VERDICT r4 #1): the tunneled TPU backend can wedge for ~10 min
after any killed process on the host (FailedPrecondition/Unavailable on the
next dispatch). Every section runs under `_wedge_retry`, which recreates ALL
device state per attempt and backs off past the wedge window; and the noise
schedule's buffers are host numpy (schedule.HostArray), so jit LOWERING never
performs the device fetch that crashed the round-4 run.

The reference has no published numbers (BASELINE.md): vs_baseline compares
against `BENCH_BASELINE.json` — this repo's first recorded TPU run of each
metric (the SID-resolution baseline is round 1's integrated tiled-eval
measurement, 1.63 s/denoise-step = 0.01227 img/s, CLAUDE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             'BENCH_BASELINE.json')
HEADLINE = 'sid_val_50step_1424x2128_images_per_sec_per_chip'
SECONDARY = 'sid_val_50step_512px_images_per_sec_per_chip'
TRAIN = 'sid_train_256px_b8_images_per_sec_per_chip'
# TPU v5e (v5-lite) bf16 peak per chip — spec sheet value. The part in this
# image measures ~121 TF/s on a chained 8k matmul (CLAUDE.md r3 roofline);
# MFU is reported against BOTH (spec = comparable across reports, measured =
# the real speed-of-light headroom on this device).
PEAK_BF16_FLOPS = 197e12
MEASURED_BF16_FLOPS = 121e12

_TRANSIENT = ('FAILED_PRECONDITION', 'FailedPrecondition', 'UNAVAILABLE',
              'Unavailable', 'DEADLINE_EXCEEDED', 'DeadlineExceeded',
              'ABORTED', 'INTERNAL: Socket closed')


def _wedge_retry(fn, what: str, attempts: int = 3):
    """Run `fn` (which must create ALL its device state internally), retrying
    across the documented ~10-min tunnel wedge after backend errors.

    Only transient backend conditions are retried; programming errors
    re-raise immediately. Between attempts the jit caches are dropped so
    poisoned executables / baked-in device constants are rebuilt from host
    state (the persistent on-disk compile cache survives, keeping retries
    cheap)."""
    import jax
    waits = (120, 420, 660)
    for i in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — filtered below
            s = repr(e)
            if not any(k in s for k in _TRANSIENT) or i == attempts - 1:
                raise
            wait = waits[min(i, len(waits) - 1)]
            print('# %s: transient backend error (%s…); retry %d/%d in %ds'
                  % (what, s[:160], i + 1, attempts - 1, wait),
                  file=sys.stderr)
            sys.stderr.flush()
            time.sleep(wait)
            jax.clear_caches()


def _load_baselines() -> dict:
    if not os.path.exists(BASELINE_FILE):
        return {}
    try:
        with open(BASELINE_FILE) as fh:
            raw = json.load(fh)
    except Exception:
        return {}
    if 'metrics' in raw:
        return raw['metrics']
    # round-1 format: single value = the 512px metric's first run
    return {SECONDARY: raw['value']}


def _save_baselines(metrics: dict):
    with open(BASELINE_FILE, 'w') as fh:
        json.dump({'metrics': metrics,
                   'note': 'first recorded TPU run per metric; vs_baseline '
                           'in later rounds is relative to these'}, fh,
                  indent=1)


def main():
    import jax
    import jax.numpy as jnp

    from ucdir_tpu.config import parse
    from ucdir_tpu.models.factory import define_G
    from ucdir_tpu.schedule import make_schedule
    from ucdir_tpu.train.step import make_eval_step

    cfg = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'ucdir_tpu', 'configs', 'sid.yaml')
    opt = parse(cfg, phase='val', checkpoint=None, num_processes=1,
                make_dirs=False)
    module = define_G(opt, use_pallas=True)
    sched = make_schedule(opt['model']['beta_schedule']['val'])  # 50 steps, 0.4

    def make_vars(key):
        # random-init weights: throughput is checkpoint-independent. Rebuilt
        # inside every retried section so a wedged backend can't leave the
        # whole run holding dead buffers.
        x0 = jax.random.uniform(key, (1, 64, 64, 3), jnp.float32, -1, 1)
        return jax.jit(module.init)(
            {'params': key, 'dropout': key}, {'HR': x0, 'SR': x0},
            jnp.ones((1, 1), jnp.float32) * 0.5, jnp.zeros_like(x0))

    def timed(fn, *args, n_iters=1):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_t = time.time() - t0
        t0 = time.time()
        for i in range(n_iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / n_iters, compile_t

    results = {}
    key = jax.random.PRNGKey(0)

    # ---- headline: real SID resolution, integrated val path, bf16 ----------
    sid_h, sid_w = 1424, 2128

    def run_headline():
        variables = make_vars(key)
        x_sid = jax.random.uniform(key, (1, sid_h, sid_w, 3), jnp.float32,
                                   -1, 1)
        # seg_steps: the axon tunnel kills single executions >~60s (measured:
        # 35-step/57s ok, 50-step/81s UNAVAILABLE); 25-step segments are
        # bit-identical with one extra ~ms dispatch
        eval_bf16 = make_eval_step(module, sched, pad=64,
                                   compute_dtype=jnp.bfloat16, seg_steps=25)
        return timed(lambda: eval_bf16(variables, x_sid, key))

    dt_sid, c_sid = _wedge_retry(run_headline, 'headline')
    results[HEADLINE] = 1.0 / dt_sid

    # MFU estimate: XLA-counted FLOPs of the compiled program / time / peak.
    # hw MFU includes the densified-AKGM FLOP waste (the FLOPs the chip
    # actually executes); useful MFU counts the reference grouped-conv AKGM
    # form (no densification) — the algorithmic FLOPs a perfect
    # implementation would need. All lowerings happen under eval_dispatch()
    # so the counted program carries the same conv-dispatch floors as the
    # executed eval program (ADVICE r4), and both legs of the waste delta
    # are lowered from use_pallas=False modules so the (dense - grouped)
    # difference is XLA-counted on both sides (no pl.CostEstimate
    # convention mixed in).
    mfu = mfu_useful = None
    try:
        from ucdir_tpu.ops.conv_pallas import eval_dispatch
        # XLA counts a scan body once, so count one denoiser call at the
        # per-step working size and scale: n_calls x 50 steps + the predictor
        # pass. Lower only — never executed; compiles are cached.
        import jax.tree_util as jtu
        variables = make_vars(key)
        vars16 = jtu.tree_map(lambda p: p.astype(jnp.bfloat16), variables)
        H, W = sid_h + 2 * 64, sid_w + 2 * 64       # after the eval pad
        untiled_max = int(os.environ.get('UCDIR_TPU_UNTILED_MAX_PX',
                                         '4300000'))
        if H * W <= untiled_max:
            # whole-image path (TPU-first default): one denoise per step at
            # the /32-padded full resolution
            th = -(-H // 32) * 32
            tw = -(-W // 32) * 32
            n_calls = 1
        else:
            from ucdir_tpu.parallel.tiled import compute_tile_starts
            th = tw = 1024
            n_calls = len(compute_tile_starts(H + 128, W + 128, 1024, 64))
        tb = jnp.zeros((1, th, tw, 6), jnp.bfloat16)
        tg = jnp.zeros((1, th, tw, 3), jnp.bfloat16)
        nl = jnp.zeros((1, 1), jnp.bfloat16)

        def _count(mod, x, g):
            with eval_dispatch():
                return jax.jit(
                    lambda v, xx, n, gg: mod.denoise_fn.apply(
                        {'params': v['params']['denoise_fn']}, xx, n, gg,
                        method='naiveforward')).lower(
                            vars16, x, nl, g).compile(
                            ).cost_analysis()['flops']

        tile_flops = _count(module, tb, tg)
        with eval_dispatch():
            pred_flops = jax.jit(
                lambda v, x: module.apply(v, x, method='predict_init')).lower(
                    vars16, jnp.zeros((1, H, W, 3), jnp.bfloat16)
                ).compile().cost_analysis()['flops']
        total = tile_flops * n_calls * sched.num_timesteps + pred_flops
        mfu = total / dt_sid / PEAK_BF16_FLOPS
        # useful-FLOP count: the reference grouped-conv AKGM form carries no
        # densified 8x candidate waste, but its pure-XLA lowering at the
        # full whole-image size does not fit the compile-time HBM budget
        # (~13 GB grouped-conv temps at 1568x2272). The waste DELTA
        # (densified minus grouped) is all conv FLOPs — exactly linear in
        # pixels — so measure it at half resolution per axis and scale by
        # the pixel ratio; the quadratic attention terms cancel in the
        # difference. Lower-only; the persistent compile cache amortizes.
        ch = -(-(th // 2) // 32) * 32
        cw = -(-(tw // 2) // 32) * 32
        px_scale = (th * tw) / float(ch * cw)
        hb = jnp.zeros((1, ch, cw, 6), jnp.bfloat16)
        hg = jnp.zeros((1, ch, cw, 3), jnp.bfloat16)

        def _xla_count(form):
            os.environ['UCDIR_TPU_AKGM_FORM'] = form
            try:
                mod = define_G(opt, use_pallas=False)
                return _count(mod, hb, hg)
            finally:
                del os.environ['UCDIR_TPU_AKGM_FORM']

        half_dense = _xla_count('densified')
        half_ref = _xla_count('reference')
        tile_useful = tile_flops - px_scale * (half_dense - half_ref)
        useful = tile_useful * n_calls * sched.num_timesteps + pred_flops
        mfu_useful = useful / dt_sid / PEAK_BF16_FLOPS
    except Exception as e:  # cost_analysis availability varies per backend
        print('# cost_analysis unavailable: %r' % (e,), file=sys.stderr)

    # ---- secondary: 512px whole-image (round-1 headline, trend) ------------
    def run_512():
        variables = make_vars(key)
        x512 = jax.random.uniform(key, (1, 512, 512, 3), jnp.float32, -1, 1)
        eval512 = make_eval_step(module, sched, pad=0,
                                 compute_dtype=jnp.bfloat16)
        dt512, _ = timed(lambda: eval512(variables, x512, key), n_iters=3)
        # bf16 sanity vs fp32 (same keys, same weights)
        eval512_32 = make_eval_step(module, sched, pad=0)
        out32 = eval512_32(variables, x512, key)[0]
        out16 = eval512(variables, x512, key)[0]
        dev = float(jnp.mean(jnp.abs(out16 - out32)))
        return dt512, dev

    dt512 = dev = None
    try:
        dt512, dev = _wedge_retry(run_512, '512px')
        results[SECONDARY] = 1.0 / dt512
    except Exception as e:
        print('# 512px bench failed: %r' % (e,), file=sys.stderr)

    # ---- train throughput: B=8 256px crops, bf16, shipped defaults ---------
    # (full jitted step: fwd + hand-written-bwd + AdamW + EMA — the sr.py
    # train-phase program; tracked so train-side regressions are driver-visible)
    def run_train():
        from ucdir_tpu.train import (create_train_state, make_optimizer,
                                     make_train_step)
        variables = make_vars(key)
        B, S = 8, 256
        batch = {'HR': jax.random.uniform(key, (B, S, S, 3), jnp.float32,
                                          -1, 1),
                 'SR': jax.random.uniform(key, (B, S, S, 3), jnp.float32,
                                          -1, 1)}
        sched_tr = make_schedule(opt['model']['beta_schedule']['train'])
        tx = make_optimizer(opt['train']['optimizer'])
        state = create_train_state(variables['params'], tx,
                                   opt['train'].get('ema'))
        tstep = make_train_step(module, sched_tr, compute_dtype=jnp.bfloat16)
        state, _ = tstep(state, batch, key)   # compile + warmup
        jax.block_until_ready(state.params)
        t0 = time.time()
        for i in range(10):
            state, _ = tstep(state, batch, jax.random.fold_in(key, i))
        jax.block_until_ready(state.params)
        return (time.time() - t0) / 10

    dt_train = None
    try:
        dt_train = _wedge_retry(run_train, 'train')
        results[TRAIN] = 8 / dt_train
    except Exception as e:
        print('# train bench failed: %r' % (e,), file=sys.stderr)

    baselines = _load_baselines()
    changed = False
    for m, v in results.items():
        if m not in baselines:
            baselines[m] = v
            changed = True
    if changed:
        _save_baselines(baselines)

    print(json.dumps({
        'metric': HEADLINE,
        'value': round(results[HEADLINE], 6),
        'unit': 'images/sec/chip',
        'vs_baseline': round(results[HEADLINE] / baselines[HEADLINE], 4),
    }))
    mfu_s = ''
    if mfu is not None:
        mfu_s = ('; hw MFU ~%.1f%% of spec peak (~%.1f%% of the measured '
                 '121 TF/s device peak)'
                 % (100 * mfu,
                    100 * mfu * PEAK_BF16_FLOPS / MEASURED_BF16_FLOPS))
        if mfu_useful is not None:
            mfu_s += ('; useful-FLOP MFU ~%.1f%% of spec (densified-AKGM '
                      'waste excluded)' % (100 * mfu_useful))
    print('# SID 1424x2128 whole-image: %.2f s/img (compile+first %.0fs)%s'
          % (dt_sid, c_sid, mfu_s), file=sys.stderr)
    if dt512 is not None:
        print('# 512px: %.4f img/s (%.3f s/img, x%.2f vs r1 baseline); '
              'bf16 mean|dev| vs fp32: %.4f'
              % (results[SECONDARY], dt512,
                 results[SECONDARY] / baselines[SECONDARY], dev),
              file=sys.stderr)
    if dt_train is not None:
        print('# train 256px B=8 bf16: %.4f s/step (%.2f img/s, x%.2f vs '
              'first recorded run)'
              % (dt_train, results[TRAIN],
                 results[TRAIN] / baselines[TRAIN]), file=sys.stderr)


if __name__ == '__main__':
    main()
