#!/bin/bash
# Round-4 TPU measurement batch — run legs SEQUENTIALLY (one python at a
# time: 1-core host, shared tunnel TPU; generous timeouts — a timeout-kill
# wedges the tunnel ~10min). Log: /tmp/r4_ab.log (or $1).
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_ab.log}
: > "$LOG"
run() { local desc=$1; shift; echo "== $(date +%H:%M:%S) $desc" >> "$LOG";
        timeout 2400 "$@" >> "$LOG" 2>&1 || echo "LEG-FAIL $desc" >> "$LOG"; }

# --- 512px regression bisect (VERDICT item 2; base leg done: 0.3726) ------
run 512-xcol0    env UCDIR_TPU_XCOL=0 python tools/ab512.py xcol0 50 3
run 512-nodown   env UCDIR_TPU_NO_PALLAS_DOWN=1 python tools/ab512.py nodown 50 3
run 512-padfree0 env UCDIR_TPU_PADFREE=0 python tools/ab512.py padfree0 50 3
run 512-chain0   env UCDIR_TPU_CHAIN_STATS=0 python tools/ab512.py chain0 50 3
run 512-r2ish    env UCDIR_TPU_XCOL=0 UCDIR_TPU_NO_PALLAS_DOWN=1 UCDIR_TPU_PADFREE=0 UCDIR_TPU_CHAIN_STATS=0 python tools/ab512.py r2ish 50 3

# --- resident vs reassembling single-chip at SID size (VERDICT item 1) ----
run res-resident    python tools/ab_resident.py resident 6
run res-reassemble  env UCDIR_TPU_NO_RESIDENT=1 python tools/ab_resident.py reassemble 6

# --- train A/Bs under shipped defaults (ADVICE 4 + VERDICT item 5) --------
run tr-pallas        python tools/train_bench.py pallas remat
run tr-pallas-norem  python tools/train_bench.py pallas noremat
run tr-xla           python tools/train_bench.py xla remat
run tr-chain0        env UCDIR_TPU_CHAIN_STATS=0 python tools/train_bench.py pallas remat
run tr-nobwd         env UCDIR_TPU_PALLAS_BWD=0 python tools/train_bench.py pallas remat

# --- full-SID chained-stats hardware parity (ADVICE item 1) ---------------
run parity-full   python tools/ab_parity.py 1424 2128

# --- deferred r3 SID legs (VERDICT item 6 of 'weak') -----------------------
run sid-bigc      env UCDIR_TPU_CONV_BIGC=1 python tools/ab_sid.py 6 1424 2128 bigc
run sid-bands     env UCDIR_TPU_ATTN_BANDS=1 python tools/ab_sid.py 6 1424 2128 bands

# --- quality A/B: untiled+windowed vs reference-tiled on a trained toy -----
# (VERDICT item 3; trains ~3000 steps then samples one 1152x1664 image 3 ways)
echo "== $(date +%H:%M:%S) quality" >> "$LOG"
timeout 5400 python tools/quality_ab.py >> "$LOG" 2>&1 || echo "LEG-FAIL quality" >> "$LOG"
echo "DONE $(date +%H:%M:%S)" >> "$LOG"
