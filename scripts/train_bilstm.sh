#!/bin/bash
# Bi-directional LSTM with MoE head (fork's bidirectional family).
set -e
DATA=${DATA:-data}
python train.py \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --feature_names=rgb,audio --feature_sizes=1024,128 \
  --frame_features=True \
  --model=BiLstmModel --lstm_cells=1024 --lstm_layers=2 \
  --batch_size=256 --base_learning_rate=0.001 \
  --train_dir="${TRAIN_DIR:-runs/bilstm}" "$@"
