#!/usr/bin/env bash
# Launch scripts/run_multihost.py on every worker of a TPU pod slice.
#
# The reference's cluster plumbing was a single-node SLURM batch script
# (src_cpp/FACPP.sbatch); on Cloud TPU the unit is the pod slice and the
# launcher is "run the same process on every host" — jax.distributed picks
# up the topology from the TPU runtime, no MPI/hostfile needed.
#
# Usage:
#   TPU_NAME=my-v5e-16 ZONE=us-west4-a ./scripts/launch_pod.sh [train|bench]
set -euo pipefail

TPU_NAME="${TPU_NAME:?set TPU_NAME}"
ZONE="${ZONE:?set ZONE}"
MODE="${1:-train}"
REPO_DIR="${REPO_DIR:-\$HOME/tpu-flash}"

exec gcloud compute tpus tpu-vm ssh "${TPU_NAME}" \
  --zone="${ZONE}" \
  --worker=all \
  --command="cd ${REPO_DIR} && python scripts/run_multihost.py ${MODE}"
