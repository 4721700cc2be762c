#!/usr/bin/env bash
# Launch training on a TPU VM / pod slice.
#
# Replaces the reference SLURM scripts (slurms/train_scripts/*.sh): on Cloud
# TPU every host runs the same command; jax.distributed auto-discovers the
# coordinator on pods. Auto-requeue on transient failure mirrors the
# reference's `scontrol requeue` retry loop.
#
# Usage (single host):
#   bash launchers/train_tpu.sh config/train/pi0_finetune_bridge.yaml
# Usage (pod, via gcloud):
#   gcloud compute tpus tpu-vm ssh $TPU --worker=all -- \
#       "cd intact_tpu && bash launchers/train_tpu.sh config/train/pi0_finetune_bridge.yaml"
set -uo pipefail

CONFIG=${1:?usage: train_tpu.sh <config.yaml> [extra --overrides]}
shift || true

export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd):${PYTHONPATH:-}"
export VLA_LOG_DIR=${VLA_LOG_DIR:-log}
export VLA_DATA_DIR=${VLA_DATA_DIR:-/tmp/vla_data}

MAX_RETRIES=${MAX_RETRIES:-3}
for attempt in $(seq 1 "$MAX_RETRIES"); do
    python -m intact_tpu.run --config_path "$CONFIG" "$@" && exit 0
    code=$?
    echo "train attempt $attempt failed (exit $code); retrying" >&2
    sleep 10
done
exit 1
