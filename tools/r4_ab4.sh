#!/bin/bash
# Round-4 part 4: train-side check of the MIN_DIM=196 default flip (256px
# crops newly route /1 convs to the pallas kernels) + the crop-128 quality
# scaling probe.
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_ab4.log}
: > "$LOG"
run() { local desc=$1; shift; echo "== $(date +%H:%M:%S) $desc" >> "$LOG";
        timeout 2400 "$@" >> "$LOG" 2>&1 || echo "LEG-FAIL $desc" >> "$LOG"; }

run tr-min196 env UCDIR_TPU_CONV_MIN_DIM=196 python tools/train_bench.py pallas remat
run tr-min196-pf env UCDIR_TPU_CONV_MIN_DIM=196 UCDIR_TPU_PADFREE=1 python tools/train_bench.py pallas remat

# quality scaling probe: crop-128-trained toy (4x the attention tokens, 4x
# the GN-stat area) — does the untiled-vs-tiled gap shrink with scope?
echo "== $(date +%H:%M:%S) quality-crop128" >> "$LOG"
timeout 5400 env QAB_CROP=128 python tools/quality_ab.py >> "$LOG" 2>&1 \
    || echo "LEG-FAIL quality-crop128" >> "$LOG"
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
