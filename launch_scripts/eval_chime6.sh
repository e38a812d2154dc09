#!/usr/bin/env bash
# Entropy-augmented NSTI spot run (reference launch_scripts/eval_chime6.sh
# active line): earnings22 test, epochs 1, published masks, entropy aug on.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m dynamic_asr_eval_tpu.evals.run -d earnings22 -split test -r 1 \
  -seq 16384 -o 14336 \
  -kwargs epochs=1 optim_lr=9e-5 spec_augment_n_freq_masks=6 \
  spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 \
  shuffle=true entropy_augmentation=true "$@"
