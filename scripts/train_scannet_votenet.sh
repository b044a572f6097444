#!/usr/bin/env bash
# VoteNet detection on ScanNet — mirrors reference
# downstream/votenet_det_new/scripts/train_scannet.sh:13-25
# (sparseconv backbone, 40k points, 2.5cm voxels, Adam 1e-3, 180 epochs).
set -e
DATA=${1:?usage: train_scannet_votenet.sh <det_data_path> [pretrain_weights] [overrides...]}
WEIGHTS=${2:-}
python -m pointcontrast_tpu.apps.votenet \
  data.dataset=scannet data.data_path="$DATA" net.backbone=sparseconv \
  net.weights="$WEIGHTS" "${@:3}"
