#!/usr/bin/env bash
# Per-NST-checkpoint zero-shot eval (reference
# eval_lists/eval_list_NST_epochs.sh): epochs 0 over a list of NST
# finetuning checkpoints.  Set CKPT_DIR=<dir with <step>.dae checkpoints>.
set -euo pipefail
cd "$(dirname "$0")/.."
RUN="python -m dynamic_asr_eval_tpu.evals.run"
CKPT_DIR=${CKPT_DIR:?"set CKPT_DIR=<checkpoint directory>"}
CHECKPOINTS=(5 10 20 40 80 100 101 120 140)
for step in "${CHECKPOINTS[@]}"; do
  for split in dev test; do
    echo "checkpoint ${step} split ${split}"
    $RUN -d earnings22 -split "$split" -seq 16384 -o 14336 -r 1 \
      --checkpoint "${CKPT_DIR}/${step}.dae" \
      -s "./results/nst_epochs/${step}_${split}.pkl" -kwargs epochs=0 "$@"
  done
done
