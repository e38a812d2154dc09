#!/usr/bin/env bash
# Low-epoch sweep companion to per_epoch_eval.sh (reference
# launch_scripts/per_epoch_eval-1.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
KW="optim_lr=0.00009 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 spec_augment_n_freq_masks=6"
for epoch in 1 2 3 4 5 10; do
  echo "epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run -d earnings22 -split test -r 1 \
    -seq 16384 -o 14336 \
    -s "./results/per_epoch_eval/epoch-$epoch-earnings22-test.pkl" \
    -kwargs $KW epochs=$epoch "$@"
done
