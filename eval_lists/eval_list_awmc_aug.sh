#!/usr/bin/env bash
# AWMC + augmentation (reference eval_lists/eval_list_awmc_aug.sh):
# epochs 5, lr 1e-5, 5x23 freq masks, 3 repeats.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
KW="optim_lr=0.00001 spec_augment_n_freq_masks=5 spec_augment_freq_mask_param=23 spec_augment_n_time_masks=0 epochs=5"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN --awmc -d "$ds" -split "$split" -seq 16384 -o 14336 -r 3 \
      -s "./results/awmc_aug/${ds}_${split}.pkl" -kwargs $KW "$@"
  done
done
