#!/usr/bin/env bash
# SLURM evaluation launcher (reference tools/slurm_test.sh analog):
# one task per host.
#
# Usage: ./tools/slurm_test.sh <partition> <job_name> <config> <ckpt> [extra...]
set -e
PARTITION=$1
JOB_NAME=$2
CONFIG=$3
CHECKPOINT=$4
shift 4
HOSTS=${HOSTS:-1}
CPUS_PER_TASK=${CPUS_PER_TASK:-32}
SRUN_ARGS=${SRUN_ARGS:-""}

exec srun -p "$PARTITION" \
    --job-name="$JOB_NAME" \
    --nodes="$HOSTS" \
    --ntasks="$HOSTS" \
    --ntasks-per-node=1 \
    --cpus-per-task="$CPUS_PER_TASK" \
    --kill-on-bad-exit=1 \
    $SRUN_ARGS \
    python "$(dirname "$0")/test.py" "$CONFIG" "$CHECKPOINT" --multihost "$@"
