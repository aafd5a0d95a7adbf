#!/bin/bash
# Boosted two-member ensemble (reference fork: boosting via sample
# reweighting between members; SURVEY.md §2.2).
#
#   member 1: uniform weights
#   fit boost weights from member 1's TRAIN-split errors
#   member 2: trained with --boost_weights_file (hard videos upweighted)
#   final: weighted average of both members' test predictions
set -e
DATA=${DATA:-data}
OUT=${OUT:-runs/boosted}
MODEL_FLAGS=${MODEL_FLAGS:---model=MoeModel --frame_features=False \
  --feature_names=mean_rgb,mean_audio --feature_sizes=1024,128}
mkdir -p "$OUT"

# 1. member 1
python train.py --train_data_pattern="$DATA/train*.tfrecord" \
  $MODEL_FLAGS --train_dir="$OUT/member1" "$@"

# 2. member 1's predictions on the TRAIN split
python inference.py --input_data_pattern="$DATA/train*.tfrecord" \
  $MODEL_FLAGS --train_dir="$OUT/member1" \
  --output_probabilities_dir="$OUT/member1_train_probs" --output_file=""

# 3. boost weights from its errors
python -m yt8m_tpu.ensemble.boosting \
  --predictions_dir="$OUT/member1_train_probs" \
  --train_data_pattern="$DATA/train*.tfrecord" \
  --output="$OUT/boost_weights.npz"

# 4. member 2, reweighted
python train.py --train_data_pattern="$DATA/train*.tfrecord" \
  $MODEL_FLAGS --train_dir="$OUT/member2" \
  --boost_weights_file="$OUT/boost_weights.npz" "$@"

# 5. ensemble both members on validate/test
for m in member1 member2; do
  python inference.py --input_data_pattern="$DATA/validate*.tfrecord" \
    $MODEL_FLAGS --train_dir="$OUT/$m" \
    --output_probabilities_dir="$OUT/${m}_val_probs" --output_file=""
done
python -m yt8m_tpu.cli.ensemble \
  --member_dirs="$OUT/member1_val_probs,$OUT/member2_val_probs" \
  --fit_weights --eval_labels_pattern="$DATA/validate*.tfrecord" \
  --output_file="$OUT/boosted_ensemble.csv"
