#!/usr/bin/env bash
# Stanford S3DIS Area-5 finetune — mirrors reference scripts/train_stanford3d.sh
# (5cm voxels, lr 0.1 PolyLR).
set -e
DATA=${1:?usage: train_stanford3d_semseg.sh <stanford_path> [pretrain_weights] [overrides...]}
WEIGHTS=${2:-}
python -m pointcontrast_tpu.apps.semseg \
  data.dataset=StanfordArea5Dataset data.path="$DATA" \
  optimizer.lr=0.1 optimizer.max_iter=60000 \
  net.weights="$WEIGHTS" "${@:3}"
