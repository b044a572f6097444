#!/usr/bin/env bash
# Scheduler-agnostic requeue loop: the TPU-native analog of the reference's
# submitit SLURM requeue (pretrain defaults.yaml hydra/launcher:
# submitit_slurm).  The apps exit with code 3 after checkpointing when they
# receive SIGTERM/SIGUSR1 (utils/preemption.py); this wrapper restarts them,
# and the trainers auto-resume from the latest checkpoint.
#
# Usage: scripts/run_with_requeue.sh python -m pointcontrast_tpu.apps.pretrain ...
set -u
REQUEUE_CODE=3
MAX_REQUEUES="${MAX_REQUEUES:-100}"

n=0
while true; do
  "$@"
  code=$?
  if [ "$code" -ne "$REQUEUE_CODE" ]; then
    exit "$code"
  fi
  n=$((n + 1))
  if [ "$n" -gt "$MAX_REQUEUES" ]; then
    echo "run_with_requeue: exceeded MAX_REQUEUES=$MAX_REQUEUES" >&2
    exit 1
  fi
  echo "run_with_requeue: preempted, restarting (attempt $n)" >&2
done
