#!/usr/bin/env bash
# Evaluation launch (single host drives the eval split).
set -euo pipefail
python "$(dirname "$0")/../test.py" "$@"
