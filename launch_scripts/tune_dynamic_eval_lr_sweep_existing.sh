#!/usr/bin/env bash
# LR sweep resuming an existing sweep log (reference
# launch_scripts/tune_dynamic_eval_lr_sweep_existing.sh): appends to the
# same JSONL so completed points are visible alongside new ones.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m dynamic_asr_eval_tpu.evals.run_sweep \
  -sc sweep_configs/NST_FT.yaml -run_script main \
  --out "./results/sweeps/nst_ft.jsonl" --no_wandb "$@"
