#!/usr/bin/env bash
# Random-noise-augmented NSTI at the tuned point (reference
# launch_scripts/eval_list_random_noise.sh): epochs 5, lr 1e-4,
# noise 0.32282279559339133, 3 repeats.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
KW="optim_lr=0.0001 random_noise=0.32282279559339133 epochs=5"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 16384 -o 14336 -r 3 \
      -s "./results/random_noise/${ds}-${split}.pkl" -kwargs $KW "$@"
  done
done
