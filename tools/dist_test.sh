#!/usr/bin/env bash
# Multi-host evaluation launcher (reference tools/dist_test.sh analog).
#
# On TPU pods every host runs the same command; JAX discovers the topology
# from the TPU runtime. For explicit coordination set:
#   JAX_COORDINATOR_ADDRESS=<host0>:<port> JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i
#
# Usage: ./tools/dist_test.sh <config> <checkpoint> [extra args...]
set -e
CONFIG=$1
CHECKPOINT=$2
shift 2
exec python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --multihost "$@"
