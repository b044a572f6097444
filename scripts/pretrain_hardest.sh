#!/usr/bin/env bash
# Hardest-contrastive pretraining — mirrors reference scripts/ddp_local.sh:13-24
# (lr 0.1, pos/neg thresholds 0.1/1.4, 60k iters).
set -e
OUT=${1:-./outputs/pretrain_hardest}
python -m pointcontrast_tpu.apps.pretrain \
  trainer.trainer=HardestContrastiveLossTrainer \
  opt.lr=0.1 opt.max_iter=60000 trainer.batch_size=4 \
  misc.out_dir="$OUT" "${@:2}"
