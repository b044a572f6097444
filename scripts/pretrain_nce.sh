#!/usr/bin/env bash
# PointInfoNCE pretraining — mirrors reference scripts/ddp_launch.sh:13-24
# (lr 0.05, nceT 0.4, npos 4096, 60k iters, global batch 32).
set -e
OUT=${1:-./outputs/pretrain_nce}
python -m pointcontrast_tpu.apps.pretrain \
  trainer.trainer=PointNCELossTrainer \
  opt.lr=0.05 misc.nceT=0.4 misc.npos=4096 opt.max_iter=60000 \
  trainer.batch_size=4 misc.out_dir="$OUT" "${@:2}"
