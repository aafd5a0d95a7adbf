#!/bin/bash
# ON-DEVICE ensemble serving: N member checkpoints in one jitted step
# (device-side weighted average + single top-20) — the TPU-native
# upgrade of ensemble_pipeline.sh's dump-then-average flow. Weights can
# come from a prior `cli/ensemble.py --fit_weights` run on validate.
#
# HETEROGENEOUS members are the default: each member's model class and
# hparams are read from its train_dir/model_flags.json (written by
# train.py), so a DBoF at cluster 8192 can serve next to a NetVLAD at
# cluster 256 with no extra flags. Set MEMBER_MODELS only to OVERRIDE
# the recorded classes (e.g. for pre-r3 dirs without model_flags.json).
#
#   MEMBER_DIRS=runs/dbof,runs/netvlad WEIGHTS=0.6,0.4 \
#     bash scripts/ensemble_serve.sh
set -e
DATA=${DATA:-data}
MEMBER_DIRS=${MEMBER_DIRS:-runs/video_moe,runs/dbof}
MEMBER_MODELS=${MEMBER_MODELS:-}  # empty = per-member model_flags.json
WEIGHTS=${WEIGHTS:-}              # empty = uniform
OUT=${OUT:-ensemble_preds.csv}

python inference.py \
  --input_data_pattern="$DATA/test*.tfrecord" \
  --feature_names=rgb,audio --feature_sizes=1024,128 --frame_features=True \
  --ensemble_train_dirs="$MEMBER_DIRS" \
  ${MEMBER_MODELS:+--ensemble_models="$MEMBER_MODELS"} \
  ${WEIGHTS:+--ensemble_weights="$WEIGHTS"} \
  --batch_size=512 --top_k=20 \
  --output_file="$OUT" \
  "$@"
echo "wrote $OUT"
