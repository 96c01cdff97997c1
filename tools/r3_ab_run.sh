#!/bin/bash
# Round-3 pending dispatch A/Bs (queued during the Aug-18 tunnel outage).
# Runs the matrix SERIALLY (one TPU process at a time — concurrent heavy
# processes wedge the tunnel), appending to /tmp/r3_ab/. Each leg gets its
# own generous timeout; a timeout-killed TPU process can wedge the tunnel
# ~10 min, so legs retry once after a cool-down.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r3_ab
mkdir -p $OUT

leg() { # name, env..., -- cmd...
  local name=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  if [ -s "$OUT/$name.ok" ]; then echo "skip $name (done)"; return; fi
  for attempt in 1 2; do
    echo "=== $name (attempt $attempt) $(date)" | tee -a $OUT/$name.log
    if env "${envs[@]}" timeout 2400 "$@" >> $OUT/$name.log 2>&1; then
      touch $OUT/$name.ok
      tail -1 $OUT/$name.log
      return
    fi
    echo "--- $name attempt $attempt FAILED (rc=$?)" >> $OUT/$name.log
    sleep 600   # let a wedged tunnel recover
  done
}

AB="python tools/ab_sid.py 6 1424 2128"

# Integrated SID step (headline path, whole-image): dispatch knob legs.
leg sid_base     X=1                        -- $AB sid_base
leg sid_chain0   UCDIR_TPU_CHAIN_STATS=0    -- $AB sid_chain0
leg sid_xcol     UCDIR_TPU_XCOL=1           -- $AB sid_xcol
leg sid_nodown   UCDIR_TPU_NO_PALLAS_DOWN=1 -- $AB sid_nodown
leg sid_bands    UCDIR_TPU_ATTN_BANDS=1     -- $AB sid_bands
leg sid_nobigc   UCDIR_TPU_CONV_BIGC=99999  -- $AB sid_nobigc

# 512px secondary program: chain + xcol gates at small maps.
AB5="python tools/ab_sid.py 6 512 512"
leg px512_base   X=1                        -- $AB5 px512_base
leg px512_chain0 UCDIR_TPU_CHAIN_STATS=0    -- $AB5 px512_chain0
leg px512_xcol   UCDIR_TPU_XCOL=1           -- $AB5 px512_xcol

# Train-side: hand-written backward kernels (PALLAS_BWD=auto default) vs XLA.
leg train_xla    X=1 -- python tools/train_bench.py xla 8 256
leg train_pallas X=1 -- python tools/train_bench.py pallas 8 256
leg train_pallas_nobwd UCDIR_TPU_PALLAS_BWD=0 -- python tools/train_bench.py pallas 8 256

# On-hardware parity: chained stats vs unchained on the integrated program.
leg parity_chain X=1 -- python tools/ab_parity.py

echo "ALL DONE $(date)" > $OUT/DONE
