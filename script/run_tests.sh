#!/usr/bin/env bash
# CPU test suite on a virtual 8-device mesh (reference script/test_*.sh role).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
