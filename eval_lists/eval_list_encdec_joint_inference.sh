#!/usr/bin/env bash
# Enc-dec JOINT CTC-beam inference (reference
# eval_lists/eval_list_encdec_joint_inference.sh): mode=joint, seq 2048.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.enc_dec_inference_test"
for ds in tedlium earnings22 chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 2048 -o 0 -mode joint \
      -s "./results/encdec_joint/${ds}_${split}.pkl" -kwargs epochs=0 "$@"
  done
done
