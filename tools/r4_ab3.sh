#!/bin/bash
# Round-4 part 3: combine the two SID wins (pad-free for all Cin -2.4%,
# CONV_MIN_DIM=196 -2.2% at 6-step SID) and check their 512px sign before
# flipping defaults. Sequential, generous timeouts.
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_ab3.log}
: > "$LOG"
run() { local desc=$1; shift; echo "== $(date +%H:%M:%S) $desc" >> "$LOG";
        timeout 2400 "$@" >> "$LOG" 2>&1 || echo "LEG-FAIL $desc" >> "$LOG"; }

run sid-combo    env UCDIR_TPU_PADFREE=1 UCDIR_TPU_CONV_MIN_DIM=196 python tools/ab_sid.py 6 1424 2128 combo
run sid-combo-b  env UCDIR_TPU_PADFREE=1 UCDIR_TPU_CONV_MIN_DIM=196 UCDIR_TPU_ATTN_BANDS=1 python tools/ab_sid.py 6 1424 2128 combo_bands
run 512-pfall    env UCDIR_TPU_PADFREE=1 python tools/ab512.py pfall 50 3
run 512-min196   env UCDIR_TPU_CONV_MIN_DIM=196 python tools/ab512.py min196 50 3
run 512-combo    env UCDIR_TPU_PADFREE=1 UCDIR_TPU_CONV_MIN_DIM=196 python tools/ab512.py combo 50 3

echo "DONE $(date +%H:%M:%S)" >> "$LOG"
