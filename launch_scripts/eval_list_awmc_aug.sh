#!/usr/bin/env bash
# Launcher twin of eval_lists/eval_list_awmc_aug.sh (the reference ships the same list
# in both directories).
set -euo pipefail
exec "$(dirname "$0")/../eval_lists/eval_list_awmc_aug.sh" "$@"
