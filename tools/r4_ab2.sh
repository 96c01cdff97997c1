#!/bin/bash
# Round-4 follow-up batch: 512px regression bisect part 2 (the r3 dispatch
# ROUTING changes, none env-covered by part 1) + SID pad-free/min-dim legs.
# Sequential, generous timeouts (see tools/r4_ab_run.sh header).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_ab2.log}
: > "$LOG"
run() { local desc=$1; shift; echo "== $(date +%H:%M:%S) $desc" >> "$LOG";
        timeout 2400 "$@" >> "$LOG" 2>&1 || echo "LEG-FAIL $desc" >> "$LOG"; }

# 512px: disable each r3 routing change in turn
run 512-nobigc  env UCDIR_TPU_CONV_BIGC=100000 python tools/ab512.py nobigc 50 3
run 512-noup    env UCDIR_TPU_NO_PALLAS_UP=1 python tools/ab512.py noup 50 3
run 512-mincin  env UCDIR_TPU_CONV_MIN_CIN=16 python tools/ab512.py mincin 50 3
run 512-mincout env UCDIR_TPU_CONV_MIN_COUT=16 python tools/ab512.py mincout 50 3
# everything suspicious off at once (r2-like dispatch at 512px)
run 512-allr2   env UCDIR_TPU_CONV_BIGC=100000 UCDIR_TPU_NO_PALLAS_UP=1 \
    UCDIR_TPU_CONV_MIN_CIN=16 UCDIR_TPU_CONV_MIN_COUT=16 \
    UCDIR_TPU_NO_PALLAS_DOWN=1 python tools/ab512.py allr2 50 3

# train: is XCOL the 0.599 -> 0.611 train delta? (ADVICE item 4)
run tr-xcol0 env UCDIR_TPU_XCOL=0 python tools/train_bench.py pallas remat

# SID: extend pad-free below Cin=128 (pads were 7.5% of the step) and
# re-try the /8 convs on the pad-free+XCOL kernels (VERDICT item 4)
run sid-pfall   env UCDIR_TPU_PADFREE=1 python tools/ab_sid.py 6 1424 2128 pfall
run sid-min196  env UCDIR_TPU_CONV_MIN_DIM=196 python tools/ab_sid.py 6 1424 2128 min196

# resident vs reassembling again at 18 steps: the 6-step legs are ~17%
# per-image fixed cost (predictor/guide/extract/materialize), which buries
# the per-step delta VERDICT item 1 asks about
run res18-resident   python tools/ab_resident.py resident18 18
run res18-reassemble env UCDIR_TPU_NO_RESIDENT=1 python tools/ab_resident.py reassemble18 18

# quality A/B rerun with 3 seeds per leg (the single-seed r4 run showed a
# 2.3 dB A-vs-B gap that may be sampler stochasticity)
echo "== $(date +%H:%M:%S) quality3" >> "$LOG"
timeout 5400 python tools/quality_ab.py >> "$LOG" 2>&1 || echo "LEG-FAIL quality3" >> "$LOG"
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
