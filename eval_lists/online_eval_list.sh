#!/usr/bin/env bash
# Online NSTI at the published operating point (reference
# eval_lists/online_eval_list.sh): epochs 1, lr 9e-5, 6x10 freq masks,
# seq 16384 / overlap 14336, 3 repeats per dataset/split.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
KW="optim_lr=0.00009 spec_augment_freq_mask_param=10 spec_augment_min_p=0.0 spec_augment_n_freq_masks=6 spec_augment_n_time_masks=0 online=true epochs=1"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 16384 -o 14336 -r 3 \
      -s "./results/online/${ds}_${split}.pkl" -kwargs $KW "$@"
  done
done
$RUN -d rev16 -split test -seq 16384 -o 14336 -r 3 \
  -s "./results/online/rev16_test.pkl" -kwargs $KW "$@"
