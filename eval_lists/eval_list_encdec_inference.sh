#!/usr/bin/env bash
# Enc-dec AR inference, no adaptation (reference
# eval_lists/eval_list_encdec_inference.sh): seq 2048, no overlap.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.enc_dec_inference_test"
for ds in earnings22 tedlium chime6; do
  for split in dev test; do
    $RUN -d "$ds" -split "$split" -seq 2048 -o 0 \
      -s "./results/encdec_inference/${ds}_${split}.pkl" -kwargs epochs=0 "$@"
  done
done
