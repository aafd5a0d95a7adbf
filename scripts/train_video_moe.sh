#!/bin/bash
# Starter video-level MoE (reference: the google/youtube-8m README recipe).
set -e
DATA=${DATA:-data}
python train.py \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --feature_names=mean_rgb,mean_audio --feature_sizes=1024,128 \
  --frame_features=False \
  --model=MoeModel --moe_num_mixtures=4 \
  --label_loss=CrossEntropyLoss \
  --batch_size=1024 --base_learning_rate=0.01 \
  --train_dir="${TRAIN_DIR:-runs/video_moe}" "$@"
