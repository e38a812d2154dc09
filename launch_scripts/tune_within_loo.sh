#!/usr/bin/env bash
# Within-recording leave-one-out transfer (reference
# launch_scripts/tune_within_loo.sh): 64k outer windows, published point.
set -euo pipefail
cd "$(dirname "$0")/.."
DATASET=${DATASET:-earnings22}
LOO_SEQ=${LOO_SEQ:-65536}
LOO_OVERLAP=${LOO_OVERLAP:-57344}
for epoch in 1 5; do
  echo "epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_within_recording_loo_eval \
    -d "$DATASET" -split test -seq 16384 -o 14336 \
    --loo_seq_len "$LOO_SEQ" --loo_overlap "$LOO_OVERLAP" \
    -s "./results/within_loo/${DATASET}-loo${LOO_SEQ}_${LOO_OVERLAP}-epoch-$epoch-test.pkl" \
    -kwargs optim_lr=0.00009 spec_augment_n_freq_masks=6 \
    spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 \
    epochs=$epoch "$@"
done
