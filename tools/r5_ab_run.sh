#!/bin/bash
# Round-5 A/B matrix on the real TPU. One leg at a time (1-core host);
# generous timeouts — NEVER timeout-kill mid-compile (wedges the tunnel).
#
#   bash tools/r5_ab_run.sh grouped   # per-group AKGM kernel (VERDICT r4 #3)
#   bash tools/r5_ab_run.sh base      # shipped-default reference leg
#
# Integrated SID whole-image step, 18-step schedule (6-step legs cannot
# resolve per-step deltas < ~20% — the ~1.4 s per-image fixed cost
# dominates; CLAUDE.md r4).
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_ab_$1.log
case "$1" in
  base)    ENV="" ;;
  grouped) ENV="UCDIR_TPU_AKGM_GROUPED=1" ;;
  groupedall) ENV="UCDIR_TPU_AKGM_GROUPED=all" ;;
  *) echo "unknown leg $1"; exit 2 ;;
esac
echo "=== leg $1 env=[$ENV] $(date)" | tee "$LOG"
env $ENV timeout 2400 python tools/ab_sid.py 18 1424 2128 "$1" 2>&1 | tee -a "$LOG"
echo "rc=$?" | tee -a "$LOG"
