#!/usr/bin/env bash
# VoteNet detection on SUN RGB-D — mirrors reference scripts/train_sunrgbd.sh
set -e
DATA=${1:?usage: train_sunrgbd_votenet.sh <det_data_path> [overrides...]}
python -m pointcontrast_tpu.apps.votenet \
  data.dataset=sunrgbd data.data_path="$DATA" data.batch_size=16 \
  "${@:2}"
