#!/usr/bin/env bash
# Cross-speaker gender transfer on TEDLIUM over epochs (reference
# launch_scripts/eval_genders.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
KW="optim_lr=0.00009 spec_augment_n_freq_masks=6 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0"
for epoch in 1 2 3 4 5; do
  echo "epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_cross_speaker_gender_tedlium \
    -d tedlium -split test -seq 16384 -o 14336 \
    -s "./results/gender_eval_tedlium/tedlium-epoch-$epoch-test.pkl" \
    -kwargs $KW epochs=$epoch "$@"
done
