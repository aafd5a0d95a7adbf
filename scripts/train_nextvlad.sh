#!/bin/bash
# NeXtVLAD (arXiv:1811.05014) — the fork family's successor; the paper's
# single-model YT-8M config (groups=8, lambda=2, K=128, hidden=1024,
# MoE-4). Serving runs the fused Pallas aggregation kernel
# (kernels/nextvlad.py) by default, and single-chip training runs the
# fused custom-VJP train core (kernels/nextvlad_train.py, measured
# 1.22-1.26x) — --adam_mu_dtype=bfloat16 stays off here because the
# 68M-param step is not Adam-bound (scripts/profile_nextvlad_train.py).
set -e
DATA=${DATA:-data}
python train.py \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --feature_names=rgb,audio --feature_sizes=1024,128 \
  --frame_features=True \
  --model=NeXtVladModel \
  --nextvlad_groups=8 --nextvlad_expansion=2 \
  --nextvlad_cluster_size=128 --nextvlad_hidden_size=1024 \
  --moe_num_mixtures=4 \
  --batch_size=256 --base_learning_rate=0.0002 \
  --learning_rate_decay_examples=2000000 \
  --train_dir="${TRAIN_DIR:-runs/nextvlad}" "$@"
