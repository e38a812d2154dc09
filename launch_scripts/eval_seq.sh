#!/usr/bin/env bash
# Sequence-length scaling eval (reference launch_scripts/eval_seq.sh):
# duration-probed recordings, NSTI adapt at full length, over epochs.
set -euo pipefail
cd "$(dirname "$0")/.."
KW="optim_lr=0.00009 spec_augment_n_freq_masks=6 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0"
for epoch in 1 2 3 4 5; do
  echo "epoch $epoch"
  python -m dynamic_asr_eval_tpu.evals.run_seq_eval -d earnings22 \
    -seq 16384 -o 14336 --nsti_seq_len -1 --nsti_overlap 0 \
    -s "./results/seqlens/earnings22-full-epoch-$epoch-test.pkl" \
    -kwargs $KW epochs=$epoch "$@"
done
