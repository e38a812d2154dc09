#!/usr/bin/env bash
# Cross-dataset transfer, epoch 1 with adapt_overlap=0 (reference
# launch_scripts/tune_cross_dataset_epoch1_ao0.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
python -m dynamic_asr_eval_tpu.evals.run_cross_dataset_eval \
  -da earnings22 -db tedlium -split test -seq 16384 -o 14336 \
  -s "./results/crossdataset/earnings22_tedlium-epoch-1-ao0-test.pkl" \
  -kwargs optim_lr=0.00009 spec_augment_n_freq_masks=6 \
  spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 \
  epochs=1 adapt_overlap=0 "$@"
