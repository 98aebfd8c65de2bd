#!/usr/bin/env bash
# Multi-host training launcher (reference tools/dist_train.sh analog).
#
# On TPU pods every host runs the same command; JAX discovers the topology
# from the TPU runtime, so no torch.distributed.launch-style process
# spawning is needed. For CPU/GPU-style explicit coordination set:
#   JAX_COORDINATOR_ADDRESS=<host0>:<port> JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
#
# Usage: ./tools/dist_train.sh <config> [extra args...]
set -e
CONFIG=$1
shift
exec python "$(dirname "$0")/train.py" "$CONFIG" --multihost "$@"
