#!/usr/bin/env bash
# LR sweep launcher (reference launch_scripts/tune_dynamic_eval_lr_sweep.sh
# equivalent): loops learning rates / epochs over the per-recording driver,
# tee-logging each run. Parameterized by env vars like the reference.
set -euo pipefail
cd "$(dirname "$0")/.."

DATASET=${DATASET:-synthetic}
SPLIT=${SPLIT:-dev}
EPOCHS_LIST=${EPOCHS_LIST:-"1 2"}
LRS=${LRS:-"1e-6 9e-6 9e-5"}
LOG_DIR=${LOG_DIR:-sweep_logs}
mkdir -p "$LOG_DIR"

for epochs in $EPOCHS_LIST; do
  for lr in $LRS; do
    echo "=== dataset=$DATASET epochs=$epochs lr=$lr ==="
    python -m dynamic_asr_eval_tpu.evals.run \
      -d "$DATASET" -split "$SPLIT" --quiet \
      -kwargs optim_lr="$lr" epochs="$epochs" \
      | tee "$LOG_DIR/${DATASET}_e${epochs}_lr${lr}.log"
  done
done
