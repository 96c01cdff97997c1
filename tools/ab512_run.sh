#!/bin/bash
# Round-4 512px regression bisect (VERDICT r3 item 2): BENCH_r02 measured
# 0.4055 img/s, BENCH_r03 0.3723 — bisect the r3 dispatch-default changes
# at 512px. Each leg is its own process so env knobs bind at trace time.
# Run ONE at a time (single-core host + shared TPU).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/ab512.log}
: > "$LOG"
run() { local tag=$1; shift; echo "== $tag $*" >> "$LOG";
        env "$@" timeout 900 python tools/ab512.py "$tag" 50 3 >> "$LOG" 2>&1; }

run base
run xcol0        UCDIR_TPU_XCOL=0
run nodown       UCDIR_TPU_NO_PALLAS_DOWN=1
run padfree0     UCDIR_TPU_PADFREE=0
run chain0       UCDIR_TPU_CHAIN_STATS=0
run r2ish        UCDIR_TPU_XCOL=0 UCDIR_TPU_NO_PALLAS_DOWN=1 UCDIR_TPU_PADFREE=0 UCDIR_TPU_CHAIN_STATS=0
echo DONE >> "$LOG"
