#!/bin/bash
# Full ensemble flow (reference fork: pre-ensemble dumps -> weight fit on
# validate GAP -> weighted-average CSV; SURVEY.md §3.5).
#
# MEMBER_DIRS: comma-separated training dirs; each must have been trained
# with its own scripts/train_*.sh.
set -e
DATA=${DATA:-data}
MEMBER_DIRS=${MEMBER_DIRS:-runs/video_moe,runs/dbof}
OUT=${OUT:-runs/ensemble}
mkdir -p "$OUT"

IFS=',' read -ra DIRS <<< "$MEMBER_DIRS"
PRED_DIRS=()
for d in "${DIRS[@]}"; do
  name=$(basename "$d")
  python inference.py \
    --input_data_pattern="$DATA/validate*.tfrecord" \
    --train_dir="$d" ${MODEL_FLAGS:-} \
    --output_probabilities_dir="$OUT/$name" --output_file=""
  PRED_DIRS+=("$OUT/$name")
done

python -m yt8m_tpu.cli.ensemble \
  --member_dirs="$(IFS=,; echo "${PRED_DIRS[*]}")" \
  --fit_weights --eval_labels_pattern="$DATA/validate*.tfrecord" \
  --output_file="$OUT/ensemble.csv"
