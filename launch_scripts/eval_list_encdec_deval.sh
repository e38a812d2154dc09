#!/usr/bin/env bash
# Enc-dec dynamic eval with teacher-filter variants (reference
# launch_scripts/eval_list_encdec_deval.sh): epochs 1/3, lr 9e-6, seq 2048,
# four filter stacks from baseline to quality+decode-agreement.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.enc_dec_dynamic_eval_test"
RESULTS_DIR="./results/enc_dec_dynamic_eval"
mkdir -p "$RESULTS_DIR"
for epoch in 1 3; do
  for variant in baseline repetition_guard quality_guard quality_plus_decode_agreement; do
    EXTRA=()
    case "$variant" in
      baseline) ;;
      repetition_guard)
        EXTRA=(--teacher_filter_max_length
               --teacher_filter_max_consecutive_token_repeat
               --teacher_filter_repeated_token_ngrams
               --teacher_filter_repeated_words) ;;
      quality_guard)
        EXTRA=(--teacher_filter_max_length
               --teacher_filter_max_consecutive_token_repeat
               --teacher_filter_repeated_token_ngrams
               --teacher_filter_repeated_words
               --teacher_filter_low_confidence
               --teacher_filter_ctc_agreement) ;;
      quality_plus_decode_agreement)
        EXTRA=(--teacher_filter_max_length
               --teacher_filter_max_consecutive_token_repeat
               --teacher_filter_repeated_token_ngrams
               --teacher_filter_repeated_words
               --teacher_filter_low_confidence
               --teacher_filter_ctc_agreement
               --teacher_filter_decode_agreement) ;;
    esac
    echo "epoch $epoch variant $variant"
    $RUN -d earnings22 -split test -seq 2048 -o 0 "${EXTRA[@]}" \
      -s "${RESULTS_DIR}/earnings22-test-${variant}-epoch-${epoch}.pkl" \
      -kwargs optim_lr=9e-6 epochs=$epoch "$@"
  done
done
