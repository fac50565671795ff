#!/usr/bin/env bash
# End-to-end DiT regression per quant mode (reference bench/video_test runners).
set -e
cd "$(dirname "$0")/.."
exec python bench/video_test.py --steps 10 --impl fp int8 int8_v8 int4 "$@"
