#!/usr/bin/env bash
# Cross-dataset transfer tuning (reference launch_scripts/tune_cross_dataset.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
KW="optim_lr=0.00009 spec_augment_n_freq_masks=6 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0"
for epoch in 1 5; do
  echo "epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_cross_dataset_eval \
    -da earnings22 -db tedlium -split test -seq 16384 -o 14336 \
    -s "./results/crossdataset/earnings22_tedlium-epoch-$epoch-test.pkl" \
    -kwargs $KW epochs=$epoch "$@"
done
