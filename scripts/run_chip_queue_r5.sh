#!/bin/bash
# One-shot runner for the r5 chip-time queue (VERDICT r4 "Next round"):
# captures the median+band headline FIRST on a quiet chip (#3), then
# the distill/boost at-scale soak in the incomplete-label regime the
# pipeline exists for (#1; the clean-label 20k run's alpha=0.5 miss is
# documented in exp_distill_alpha_sweep.py), the per-family held-out
# GAP table (#2, per-family persisted), the flagship serving profile
# (#6), the on-chip RSS phase-split (#7), and an alpha sweep on the
# soak's kept teacher-annotated records (#1 contingency).
# Priority-ordered; failures do not stop later stages. Logs: $OUT.
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

run bench_headline     python bench.py
# 13 CLI stages; 20k clean-label videos ran ~2.5h under the tunnel, so
# 12k keeps the whole queue inside the round. --keep feeds the sweep.
run distill_boost_soak timeout 9000 \
  python scripts/soak_distill_boost.py \
    --videos 12000 --label_dropout 0.3 --keep
run family_gap         python scripts/exp_family_gap.py
run flagship_serving   python scripts/profile_flagship_serving.py
run rss_phase_split    python scripts/diagnose_train_rss.py
run alpha_sweep        python scripts/exp_distill_alpha_sweep.py \
                         --alphas 0.25,0.75
echo "ALL DONE ($(date -u +%H:%M:%S))" | tee -a "$OUT/summary.log"
