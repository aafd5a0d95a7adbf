#!/bin/bash
# Gated NetVLAD + MoE head (monkeytyping/WILLOW-style flags).
set -e
DATA=${DATA:-data}
python train.py \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --feature_names=rgb,audio --feature_sizes=1024,128 \
  --frame_features=True \
  --model=GatedNetVladModel \
  --netvlad_cluster_size=256 --netvlad_hidden_size=1024 \
  --moe_num_mixtures=4 \
  --batch_size=256 --base_learning_rate=0.0002 \
  --learning_rate_decay_examples=2000000 \
  --train_dir="${TRAIN_DIR:-runs/netvlad}" "$@"
