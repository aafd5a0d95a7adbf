#!/bin/bash
# Distillation flow (reference fork, SURVEY.md §2.2):
#   1. teacher (or teacher ensemble) dumps dense predictions on the TRAIN
#      split (inference-pre-ensemble style),
#   2. predictions are written back into the training TFRecords,
#   3. the student trains on alpha*CE(labels) + (1-alpha)*CE(teacher).
set -e
DATA=${DATA:-data}
TEACHER_DIR=${TEACHER_DIR:-runs/netvlad}
TEACHER_FLAGS=${TEACHER_FLAGS:---model=GatedNetVladModel --feature_names=rgb,audio --feature_sizes=1024,128 --frame_features=True}
STUDENT_DIR=${STUDENT_DIR:-runs/student}
STUDENT_FLAGS=${STUDENT_FLAGS:---model=DbofModel --feature_names=rgb,audio --feature_sizes=1024,128 --frame_features=True}
OUT=${OUT:-runs/distill}

mkdir -p "$OUT"

# 1. teacher predictions on the train split
python inference.py \
  --input_data_pattern="$DATA/train*.tfrecord" \
  --train_dir="$TEACHER_DIR" $TEACHER_FLAGS \
  --output_probabilities_dir="$OUT/teacher_preds" --output_file=""

# 2. inject teacher predictions into the records
python - <<PY
from yt8m_tpu.ensemble.distill import (
    teacher_from_prediction_dir, write_distill_dataset)
teacher = teacher_from_prediction_dir("$OUT/teacher_preds")
n = write_distill_dataset(
    "$DATA/train*.tfrecord", teacher, "$OUT/distill_data",
    frame_level=True, top_k_sparsify=64)
print(f"annotated {n} videos")
PY

# 3. student trains on the mixed loss
python train.py \
  --train_data_pattern="$OUT/distill_data/train*.tfrecord" \
  --distill_data_pattern=teacher \
  --label_loss=MixedCrossEntropyDistillLoss \
  $STUDENT_FLAGS --train_dir="$STUDENT_DIR" "$@"
