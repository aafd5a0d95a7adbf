#!/bin/bash
# One-shot runner for the r4 chip-time queue (VERDICT r3 "Next round"):
# trajectory-validates the default-ON NeXtVLAD train core (#3), closes
# the zoo-tail serving/train tables (#5), measures the FSDP-x-fused
# budget terms (#2), and re-warms the headline. Priority-ordered so a
# short tunnel window banks the most important results; failures do not
# stop later stages. Logs: $OUT.
set -u
OUT=${OUT:-/tmp/chip_queue_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "${STAGE_TIMEOUT:-3000}" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit=$rc" | tee -a "$OUT/summary.log"
}

run validate_kernels    python scripts/validate_kernels_tpu.py
run nextvlad_trajectory python scripts/exp_nextvlad_train_trajectory.py
run family_serving      python scripts/bench_family_serving.py
run family_train        python bench_train.py
run fsdp_budget         python scripts/exp_fsdp_budget.py
run bench_headline      python bench.py
echo "ALL DONE ($(date -u +%H:%M:%S))" | tee -a "$OUT/summary.log"
