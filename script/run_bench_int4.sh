#!/usr/bin/env bash
# INT4/INT2/KIVI sweep (reference script/run_triton_bench_qk_int4.sh).
set -e
cd "$(dirname "$0")/.."
exec python bench/sweep.py --bits fp int4 int2 kivi4 --seq_lens 1024 4096 8192 "$@"
