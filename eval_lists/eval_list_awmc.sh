#!/usr/bin/env bash
# AWMC without augmentation (reference eval_lists/eval_list_awmc.sh):
# epochs 1, lr 2e-4, masks off, 3 repeats.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
KW="optim_lr=0.0002 spec_augment_n_freq_masks=0 spec_augment_n_time_masks=0 epochs=1"
for ds in tedlium chime6; do
  for split in dev test; do
    $RUN --awmc -d "$ds" -split "$split" -seq 16384 -o 14336 -r 3 \
      -s "./results/awmc/${ds}_${split}.pkl" -kwargs $KW "$@"
  done
done
