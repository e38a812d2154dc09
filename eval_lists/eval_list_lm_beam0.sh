#!/usr/bin/env bash
# NSTI + LM-beam final decode, greedy TTA pseudo-labels (reference
# eval_lists/eval_list_lm_beam0.sh): epochs 5, lr 9e-5, 6x34 masks,
# lm_tta_beams=0, 3 repeats.  Set LM=<checkpoint>.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
LM=${LM:?"set LM=<path to LM checkpoint or ARPA>"}
KW="optim_lr=0.00009 spec_augment_n_freq_masks=6 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 epochs=5 lm_alpha=0.4016 lm_beta=1.625 lm_prune_less_than_val=3.221 lm_tta_beams=0"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 16384 -o 14336 -r 3 -lm "$LM" -beams 20 \
      -s "./results/lm_beam0/${ds}_${split}.pkl" -kwargs $KW "$@"
  done
done
$RUN -d rev16 -split test -seq 16384 -o 14336 -r 3 -lm "$LM" -beams 20 \
  -s "./results/lm_beam0/rev16_test.pkl" -kwargs $KW "$@"
