#!/bin/bash
# One-shot runner for the r3 chip-time queue (BENCH_NOTES "Chip-time
# queue"): validates the changed kernels, A/Bs the new NeXtVLAD serving
# kernel, re-evaluates the fused VLAD train core at B=512, profiles
# NeXtVLAD training, and re-warms the headline bench — in priority
# order so a short tunnel window still banks the most important
# results. Each stage logs to $OUT and failures do not stop later
# stages.
set -u
OUT=${OUT:-/tmp/chip_queue}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

run() {
  local name=$1; shift
  echo "=== $name ($(date -u +%H:%M:%S)) ===" | tee -a "$OUT/summary.log"
  timeout "${STAGE_TIMEOUT:-1800}" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  tail -3 "$OUT/$name.log" | tee -a "$OUT/summary.log"
  echo "--- $name exit=$rc" | tee -a "$OUT/summary.log"
}

run validate_kernels   python scripts/validate_kernels_tpu.py
run nextvlad_serving   python scripts/exp_nextvlad_serving.py
run bench_headline     python bench.py
run flagship_fusedvlad python scripts/exp_flagship_fusedvlad.py
run nextvlad_train     python scripts/profile_nextvlad_train.py
run family_serving     python scripts/bench_family_serving.py
echo "ALL DONE ($(date -u +%H:%M:%S))" | tee -a "$OUT/summary.log"
