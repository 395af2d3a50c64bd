#!/usr/bin/env bash
# Multi-host TPU-pod launcher (reference: hpc/slurm_train.sh).
#
# On GCP TPU pods, run this on every worker via:
#   gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all \
#     --command="bash deepearth-tpu/scripts/launch_pod.sh --steps 10000"
#
# jax.distributed.initialize() auto-discovers coordinator/process topology
# from the TPU metadata server; for generic clusters export:
#   COORDINATOR_ADDRESS=<host:port> NUM_PROCESSES=<n> PROCESS_ID=<rank>
# (SLURM: MASTER_ADDR/MASTER_PORT/WORLD_SIZE/RANK are also honoured —
#  see deepearth_tpu/training/distributed.py:initialize_distributed)
set -euo pipefail

REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$REPO_DIR"

echo "[launch_pod] host=$(hostname) repo=$REPO_DIR args=$*"
exec python scripts/train.py --distributed "$@"
