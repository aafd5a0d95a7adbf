#!/bin/bash
# Frame-level DBoF (reference: frame_level_models.py DbofModel flags).
set -e
DATA=${DATA:-data}
python train.py \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --feature_names=rgb,audio --feature_sizes=1024,128 \
  --frame_features=True \
  --model=DbofModel \
  --dbof_cluster_size=8192 --dbof_hidden_size=1024 \
  --dbof_pooling_method=max --iterations=30 --sample_random_frames=True \
  --batch_size=512 --base_learning_rate=0.01 \
  --train_dir="${TRAIN_DIR:-runs/dbof}" "$@"
