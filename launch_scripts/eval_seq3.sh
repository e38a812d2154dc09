#!/usr/bin/env bash
# Sequence-length scaling baseline (reference launch_scripts/eval_seq3.sh):
# epochs 0 (no adaptation) duration probe.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m dynamic_asr_eval_tpu.evals.run_seq_eval -d earnings22 \
  -seq 16384 -o 14336 --nsti_seq_len -1 --nsti_overlap 0 \
  -s "./results/seqlens/earnings22-baseline.pkl" \
  -kwargs optim_lr=0.00009 spec_augment_n_freq_masks=6 \
  spec_augment_freq_mask_param=34 spec_augment_n_time_masks=0 epochs=0 "$@"
