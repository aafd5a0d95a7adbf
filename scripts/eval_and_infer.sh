#!/bin/bash
# Evaluate latest checkpoint then write the submission CSV
# (reference: eval.py + inference.py flow).
set -e
DATA=${DATA:-data}
TRAIN_DIR=${TRAIN_DIR:-runs/video_moe}
MODEL_FLAGS=${MODEL_FLAGS:---model=MoeModel --feature_names=mean_rgb,mean_audio --feature_sizes=1024,128}

python eval.py \
  --eval_data_pattern="$DATA/validate*.tfrecord" \
  --train_dir="$TRAIN_DIR" $MODEL_FLAGS --run_once=True "$@"

python inference.py \
  --input_data_pattern="$DATA/test*.tfrecord" \
  --train_dir="$TRAIN_DIR" $MODEL_FLAGS \
  --output_file="$TRAIN_DIR/predictions.csv" --top_k=20 "$@"
