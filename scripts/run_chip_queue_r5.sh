#!/bin/bash
# One-shot runner for the r5 chip-time queue (VERDICT r4 "Next round"):
# executes the distill/boost at-scale soak (#1), banks the per-family
# held-out GAP table (#2), profiles the flagship serving step (#6),
# runs the on-chip RSS phase-split (#7), and captures the new
# median+band headline (#3). Priority-ordered; failures do not stop
# later stages. Logs: $OUT.
set -u
OUT=${OUT:-/tmp/chip_queue_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "${STAGE_TIMEOUT:-7200}" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit=$rc" | tee -a "$OUT/summary.log"
}

# the soak's 13 CLI stages run ~2.5h wall under the tunnel; give it room
run distill_boost_soak timeout 12000 \
  python scripts/soak_distill_boost.py --videos 20000
run family_gap         python scripts/exp_family_gap.py
run flagship_serving   python scripts/profile_flagship_serving.py
run rss_phase_split    python scripts/diagnose_train_rss.py
run bench_headline     python bench.py
echo "ALL DONE ($(date -u +%H:%M:%S))" | tee -a "$OUT/summary.log"
