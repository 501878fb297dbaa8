#!/usr/bin/env bash
# Multi-host data-parallel training launch (replaces the reference's
# torch.distributed.launch wrapper).  On a TPU pod slice each host runs the
# same command; jax.distributed discovers peers via the coordinator.
#
# Usage: JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N \
#        JAX_PROCESS_ID=i bash tools/scripts/dist_train.sh --cfg_file ...
set -euo pipefail
python "$(dirname "$0")/../train.py" "$@"
