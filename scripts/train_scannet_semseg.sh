#!/usr/bin/env bash
# ScanNet 2cm semseg finetune — mirrors reference scripts/train_scannet.sh:11-37
# (Res16UNet34C, lr 0.8 PolyLR, 60k iters, batch 6/device x 8 devices).
set -e
DATA=${1:?usage: train_scannet_semseg.sh <scannet_path> [pretrain_weights] [overrides...]}
WEIGHTS=${2:-}
# data.layout=chunked: per-frame sparse layout, 1.60x faster at this 2cm
# batch-6 scale (PERF.md); drops <0.3% of voxels to per-sample pad budgets.
# Pass data.layout=voxel for the exact pooled-budget reference semantics.
python -m pointcontrast_tpu.apps.semseg \
  data.dataset=ScannetVoxelization2cmDataset data.path="$DATA" \
  optimizer.lr=0.8 optimizer.max_iter=60000 data.batch_size=6 \
  data.layout=chunked \
  net.weights="$WEIGHTS" "${@:3}"
