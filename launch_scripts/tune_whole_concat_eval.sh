#!/usr/bin/env bash
# Whole-concat adapt/eval protocol (reference
# launch_scripts/tune_whole_concat_eval.sh): epochs x lr grid.
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS_STR=${EPOCHS:-"1 3 5 10"}
read -r -a EPOCHS <<< "$EPOCHS_STR"
LRS_STR=${LRS:-"9e-6 9e-5"}
read -r -a LRS <<< "$LRS_STR"
DATASET=${DATASET:-earnings22}
SPLIT=${SPLIT:-test}
RESULTS_DIR="./results/whole_concat_eval"
mkdir -p "$RESULTS_DIR"
for lr in "${LRS[@]}"; do
  for epoch in "${EPOCHS[@]}"; do
    echo "lr $lr epoch $epoch"
    python -m dynamic_asr_eval_tpu.evals.run_whole_concat_eval \
      -d "$DATASET" -split "$SPLIT" -seq 16384 -o 14336 -ao 14336 \
      -s "${RESULTS_DIR}/${DATASET}-${SPLIT}-lr${lr}-epoch-${epoch}.pkl" \
      -kwargs optim_lr=$lr spec_augment_n_freq_masks=6 \
      spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 \
      epochs=$epoch "$@"
  done
done
