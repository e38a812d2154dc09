#!/usr/bin/env bash
# LM-beam final decode WITHOUT adaptation (reference
# eval_lists/eval_list_lm_baseline.sh): epochs 0, published fusion point
# alpha=0.4016 beta=1.625 prune=3.221, 20 beams.  Set LM=<checkpoint>.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
LM=${LM:?"set LM=<path to LM checkpoint or ARPA>"}
KW="optim_lr=0.00009 spec_augment_n_freq_masks=5 spec_augment_freq_mask_param=23 spec_augment_n_time_masks=0 epochs=0 lm_alpha=0.4016 lm_beta=1.625 lm_prune_less_than_val=3.221"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 16384 -o 14336 -r 1 -lm "$LM" -beams 20 \
      -s "./results/lm_baseline/${ds}_${split}.pkl" -kwargs $KW "$@"
  done
done
