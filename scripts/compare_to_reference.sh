#!/usr/bin/env bash
# TF1-parity check against the 0.1% GAP bar (BASELINE.json north star).
#
# Given a directory of reference prediction artifacts (Kaggle submission
# CSVs from the reference inference.py, or probability dumps) and ours
# over the same eval split, report ΔGAP/ΔHit@1/ΔPERR and pass/fail.
#
# Usage:
#   scripts/compare_to_reference.sh REF_PREDS_GLOB OUR_PREDS_GLOB LABELS_GLOB
# e.g.
#   scripts/compare_to_reference.sh 'ref_run/predictions*.csv' \
#       'our_run/predictions.csv' '/data/yt8m/validate*.tfrecord'
#
# Exit 0 = all deltas within the 0.1% bar; 1 = parity broken. The last
# stdout line is a JSON report (see yt8m_tpu/cli/parity.py).
set -euo pipefail

REF=${1:?reference predictions glob}
OURS=${2:?our predictions glob}
LABELS=${3:?labels glob (tfrecords or vid,<ids> csv)}
shift 3

exec python -m yt8m_tpu.cli.parity \
    --reference_predictions="$REF" \
    --our_predictions="$OURS" \
    --labels="$LABELS" \
    --bar=0.001 \
    "$@"
