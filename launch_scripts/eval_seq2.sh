#!/usr/bin/env bash
# Sequence-length scaling eval, fixed NSTI window variants (reference
# launch_scripts/eval_seq2.sh): sweep the two-level stitch window size.
set -euo pipefail
cd "$(dirname "$0")/.."
KW="optim_lr=0.00009 spec_augment_n_freq_masks=6 spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0"
for nsti in 16384 32768 65536 131072; do
  olap=$((nsti * 7 / 8))
  for epoch in 1 5; do
    echo "nsti $nsti epoch $epoch"
    python -m dynamic_asr_eval_tpu.evals.run_seq_eval -d earnings22 \
      -seq 16384 -o 14336 --nsti_seq_len "$nsti" --nsti_overlap "$olap" \
      -s "./results/seqlens/earnings22-$nsti-epoch-$epoch-test.pkl" \
      -kwargs $KW epochs=$epoch "$@"
  done
done
