#!/bin/bash
# One-shot real-TPU session: runs the whole chip backlog sequentially with
# per-step timeouts and logs, so a recovered tunnel can be exploited the
# moment it comes back (round 4: the tunnel was down for most of the round).
#
# Usage: bash benchmarks/chip_session.sh [LOGDIR] [SOAK_BASE]
# Steps (each independent; a failure does not stop later steps):
#   1. tests_tpu smoke (bounded)             -> update tests_tpu/LEDGER.md
#   2. --tpu soak, 150 cases at SOAK_BASE    -> CLAUDE.md ledger
#   3. profile_nsub.py                       -> n_sub calibration evidence
#   4. run_all.py                            -> regenerate BENCHMARKS.md (MFU)
# NOTE: run serially; this host has ONE core and the chip is shared.
# SOAK_BASE defaults to a fresh time-derived base >= 2,000,000 (same scheme
# as fuzz_codec.py) so an unattended watcher launch never re-burns a
# ledgered base; ledger the actual base from summary.log afterwards.
set -u
LOG=${1:-/root/repo/.chip_session}
SOAK_BASE=${2:-$(( 2000000 + ($(date +%s) % 1000000) / 100 * 100 ))}
mkdir -p "$LOG"
cd /root/repo

step() {
  name=$1; tmo=$2; shift 2
  echo "=== $name (timeout ${tmo}s): $*" | tee -a "$LOG/summary.log"
  start=$(date +%s)
  timeout "$tmo" "$@" > "$LOG/$name.log" 2>&1
  rc=$?
  echo "=== $name rc=$rc took=$(( $(date +%s) - start ))s" | tee -a "$LOG/summary.log"
}

# quick probe first — abort the session if the tunnel is still dead
if ! timeout 150 python -c "import jax; assert jax.default_backend() != 'cpu'" \
    > "$LOG/probe.log" 2>&1; then
  echo "tunnel still down — aborting chip session" | tee -a "$LOG/summary.log"
  exit 1
fi
echo "tunnel UP at $(date -u +%H:%M:%S)" | tee -a "$LOG/summary.log"

step tests_tpu 900 python -m pytest tests_tpu/ -q
step soak_tpu 7200 python benchmarks/soak.py --tpu 150 "$SOAK_BASE"
step profile_nsub 1800 python benchmarks/profile_nsub.py
step run_all 3600 python benchmarks/run_all.py

echo "chip session complete — review $LOG and update ledgers" \
  | tee -a "$LOG/summary.log"
