#!/usr/bin/env bash
# INT8 kernel sweep on the attached TPU (reference script/run_triton_bench_qk_int8.sh:
# b4 h32 hd64, seq 1k..32k).
set -e
cd "$(dirname "$0")/.."
exec python bench/sweep.py --bits fp int8 int8_v8 --seq_lens 1024 2048 4096 8192 16384 32768 "$@"
