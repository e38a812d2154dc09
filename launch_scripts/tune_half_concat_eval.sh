#!/usr/bin/env bash
# Half-concat adapt/eval protocol (reference
# launch_scripts/tune_half_concat_eval.sh): env-tunable epochs/dataset.
set -euo pipefail
cd "$(dirname "$0")/.."
EPOCHS_STR=${EPOCHS:-"1 5"}
read -r -a EPOCHS <<< "$EPOCHS_STR"
DATASET=${DATASET:-earnings22}
SPLIT=${SPLIT:-test}
SEQ=${SEQ:-16384}
OVERLAP=${OVERLAP:-14336}
ADAPT_OVERLAP=${ADAPT_OVERLAP:-14336}
RESULTS_DIR="./results/half_concat_eval"
mkdir -p "$RESULTS_DIR"
for epoch in "${EPOCHS[@]}"; do
  echo "epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_half_concat_eval \
    -d "$DATASET" -split "$SPLIT" -seq "$SEQ" -o "$OVERLAP" -ao "$ADAPT_OVERLAP" \
    -s "${RESULTS_DIR}/${DATASET}-${SPLIT}-half-concat-epoch-${epoch}.pkl" \
    -log "${RESULTS_DIR}/${DATASET}-${SPLIT}-half-concat-epoch-${epoch}.log" \
    -kwargs optim_lr=0.00009 spec_augment_n_freq_masks=6 \
    spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 \
    epochs=$epoch "$@"
done
