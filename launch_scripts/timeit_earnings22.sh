#!/usr/bin/env bash
# RTF benchmark launcher (reference launch_scripts/timeit_earnings22.sh
# equivalent). The reference timed online NSTI on a 4159.9 s Earnings-22
# recording: 95.77 s * 0.8654 ≈ 82.9 s → RTF 0.023 on an A4500-class GPU.
# This runs the same protocol on a synthetic recording of the same length on
# the local TPU chip and prints the one-line JSON result.
set -euo pipefail
cd "$(dirname "$0")/.."
BENCH_SECONDS=${BENCH_SECONDS:-4159.9} python bench.py
