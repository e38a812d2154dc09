#!/usr/bin/env bash
# In-dataset + cross-dataset transfer curves over epochs (reference
# launch_scripts/eval_cross_dataset.sh): published NSTI operating point.
set -euo pipefail
cd "$(dirname "$0")/.."
KW="optim_lr=0.00009 spec_augment_n_freq_masks=6 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0"
for epoch in 0 1 2 3 4 5; do
  echo "in-dataset epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_in_dataset_eval -d earnings22 \
    -split test -seq 16384 -o 14336 \
    -s "./results/indataset/earnings22-$epoch-test.pkl" -kwargs $KW epochs=$epoch "$@"
done
for epoch in 1 2 3 4 5; do
  echo "cross-dataset epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_cross_dataset_eval \
    -da earnings22 -db tedlium -split test -seq 16384 -o 14336 \
    -s "./results/crossdataset/earnings_tedlium_epoch-$epoch-test.pkl" \
    -kwargs $KW epochs=$epoch "$@"
done
