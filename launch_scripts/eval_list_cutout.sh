#!/usr/bin/env bash
# Cutout-augmented NSTI at the tuned point (reference
# launch_scripts/eval_list_cutout.sh): epochs 7, lr 5e-5,
# cutout mean_recording 205x(792x41), 3 repeats.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
KW="optim_lr=0.00005 cutout_value=mean_recording cutout_max_height=41 cutout_max_width=792 cutout_num_rectangles=205 epochs=7"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 16384 -o 14336 -r 3 \
      -s "./results/cutout/${ds}-${split}.pkl" -kwargs $KW "$@"
  done
done
$RUN -d rev16 -split test -seq 16384 -o 14336 -r 3 \
  -s "./results/cutout/rev16-test.pkl" -kwargs $KW "$@"
