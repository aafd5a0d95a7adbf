#!/bin/bash
# NetVLAD-LSTM flagship (BASELINE.json north star: GAP >= 0.84 in < 2h
# on v5e-8). VLAD appearance branch + LSTM temporal branch -> gated MoE.
set -e
DATA=${DATA:-data}
# Perf (r3 profile, BENCH_NOTES "flagship TRAIN profile"): bf16 Adam
# first moment cuts the 411M-param optimizer HBM pass (79.5 vs 85.1 ms
# at B=256). For max single-chip throughput use --batch_size=512
# (3,679 vs 3,220 videos/s/chip — Adam traffic amortised over 2x
# videos); scale --base_learning_rate accordingly.
# Multi-chip (v5e-8): add --fsdp_min_size=1048576 — the 2h budget
# rides on FSDP + the fused train kernels (manual shard_map keeps
# them on data-only meshes; BENCH_NOTES r4 budget tables, 28-42
# epochs of the 5.6M split in 2h).
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
  --adam_mu_dtype=bfloat16 \
  --train_dir="${TRAIN_DIR:-runs/netvlad_lstm}" "$@"
