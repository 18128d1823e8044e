#!/bin/bash
# One-shot CPU-mesh soak chain: every CPU soak mode + the codec fuzzer,
# serially (ONE core — parallel runs only contend), with per-step timeouts
# and logs.  Mirrors chip_session.sh.  Bases are ARGUMENTS so the ledger
# discipline (fresh bases every session, claimed in CLAUDE.md at launch)
# stays in the working notes, not hardcoded here.
#
# Usage: bash benchmarks/cpu_chain.sh BASE_FILE [LOGDIR]
#   BASE_FILE: one "mode count base" per line (mode = soak flag w/o --,
#   or "fuzz").  Lines starting with # are skipped.
set -u
BASES=${1:?usage: cpu_chain.sh BASE_FILE [LOGDIR]}
LOG=${2:-/root/repo/.cpu_chain}
mkdir -p "$LOG"
cd /root/repo

while read -r mode count base; do
  case "$mode" in ''|'#'*) continue;; esac
  name="${mode}_${base}"
  if [ "$mode" = fuzz ]; then
    cmd=(python benchmarks/fuzz_codec.py "$count" "$base"); tmo=3600
  elif [ "$mode" = small ]; then
    cmd=(python benchmarks/soak.py "$count" "$base"); tmo=5400
  else
    cmd=(python benchmarks/soak.py "--$mode" "$count" "$base"); tmo=7200
  fi
  echo "=== $name (timeout ${tmo}s): ${cmd[*]}" | tee -a "$LOG/summary.log"
  start=$(date +%s)
  timeout "$tmo" "${cmd[@]}" > "$LOG/$name.log" 2>&1
  rc=$?
  tail -1 "$LOG/$name.log" | tee -a "$LOG/summary.log"
  echo "=== $name rc=$rc took=$(( $(date +%s) - start ))s" \
    | tee -a "$LOG/summary.log"
done < "$BASES"

echo "cpu chain complete — review $LOG and update the CLAUDE.md ledger" \
  | tee -a "$LOG/summary.log"
