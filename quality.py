"""Driver-visible QUALITY artifact (VERDICT r4 #5).

Perf regressions land in BENCH_r*.json; this gives quality regressions the
same treatment. Runs on the real TPU chip:

  1. the crop-128 quality A/B (tools/quality_ab.py): untiled+windowed shipped
     default (A) vs reference-semantics tiled (B) vs untiled+global attention
     (C) vs untiled+per-tile GN statistics scope (F, UCDIR_TPU_GN_SCOPE=tile);
  2. optionally a crop-256 probe (QUALITY_CROPS=128,256) — the production
     train scope, deciding whether the untiled default's GN-scope gap closes
     with crop size (VERDICT r4 missing #2);
  3. the sampler convergence check (tools/convergence_check.py): ddpm-50 PSNR
     on a trained toy model, threshold 30 dB (r2 measured 33.1).

Writes QUALITY_r{N}.json (N from --round, default env QUALITY_ROUND or 5) and
prints one JSON summary line. Pass criteria recorded in the artifact:
  * A (shipped default) within `gap_db` (default 0.75) of B on every crop, OR
    F closes the A-B gap to < 0.2 dB (then F is the recommended default);
  * convergence >= 30 dB.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--round', type=int,
                    default=int(os.environ.get('QUALITY_ROUND', '5')))
    ap.add_argument('--crops', type=str,
                    default=os.environ.get('QUALITY_CROPS', '128'))
    ap.add_argument('--steps', type=int,
                    default=int(os.environ.get('QAB_TRAIN_STEPS', '3000')))
    ap.add_argument('--seeds', type=str, default='123,456,789')
    ap.add_argument('--legs', type=str, default='ABCF')
    ap.add_argument('--gap-db', type=float, default=0.75)
    ap.add_argument('--skip-convergence', action='store_true')
    ap.add_argument('--size', type=str, default='1152x1664',
                    help='held-out eval canvas HxW')
    args = ap.parse_args()

    from tools import quality_ab
    H, W = (int(v) for v in args.size.split('x'))
    seeds = [int(s) for s in args.seeds.split(',')]

    art = {'round': args.round, 'sections': {}, 'criteria': {
        'untiled_vs_tiled_gap_db_max': args.gap_db,
        'convergence_db_min': 30.0}}
    ok = True
    t0 = time.time()
    for crop in (int(c) for c in args.crops.split(',')):
        r = quality_ab.run(H, W, steps=args.steps, crop=crop, seeds=seeds,
                           leg_names=list(args.legs))
        art['sections']['crop%d' % crop] = r
        legs = r['legs']
        if 'A' in legs and 'B' in legs:
            gap = legs['B']['mean'] - legs['A']['mean']
            closed = ('F' in legs
                      and legs['B']['mean'] - legs['F']['mean'] < 0.2)
            r['untiled_gap_db'] = round(gap, 3)
            r['gn_scope_tile_closes_gap'] = bool(closed)
            if gap > args.gap_db and not closed:
                ok = False

    if not args.skip_convergence:
        from tools import convergence_check
        conv = convergence_check.run() if hasattr(convergence_check, 'run') \
            else None
        if conv is None:
            # fall back to the script's CLI contract: it prints
            # 'ddpm50 ... XX.X dB' lines; import-run captured below
            import io
            import contextlib
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                convergence_check.main()
            conv = {'stdout': buf.getvalue()}
            for line in buf.getvalue().splitlines():
                if 'ddpm' in line and 'dB' in line:
                    try:
                        conv['ddpm50_db'] = float(
                            line.split('dB')[0].strip().split()[-1])
                    except ValueError:
                        pass
        art['sections']['convergence'] = conv
        db = (conv or {}).get('ddpm50_db')
        if db is not None and db < 30.0:
            ok = False

    art['pass'] = ok
    art['wall_s'] = round(time.time() - t0, 1)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'QUALITY_r%02d.json' % args.round)
    with open(out, 'w') as fh:
        json.dump(art, fh, indent=1)
    summary = {'artifact': os.path.basename(out), 'pass': ok}
    for k, v in art['sections'].items():
        if k.startswith('crop'):
            summary[k] = {m: round(v['legs'][m]['mean'], 2)
                          for m in v['legs']}
            summary[k + '_gap'] = v.get('untiled_gap_db')
    print(json.dumps(summary))


if __name__ == '__main__':
    main()
