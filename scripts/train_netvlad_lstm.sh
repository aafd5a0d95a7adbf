#!/bin/bash
# NetVLAD-LSTM flagship (BASELINE.json north star: GAP >= 0.84 in < 2h
# on v5e-8). VLAD appearance branch + LSTM temporal branch -> gated MoE.
set -e
DATA=${DATA:-data}
python train.py \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --feature_names=rgb,audio --feature_sizes=1024,128 \
  --frame_features=True \
  --model=NetVladLstmModel \
  --netvlad_cluster_size=256 --netvlad_hidden_size=1024 \
  --lstm_cells=1024 --lstm_layers=2 \
  --moe_num_mixtures=4 \
  --batch_size=256 --base_learning_rate=0.0002 \
  --learning_rate_decay_examples=2000000 \
  --train_dir="${TRAIN_DIR:-runs/netvlad_lstm}" "$@"
