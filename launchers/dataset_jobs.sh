#!/usr/bin/env bash
# Offline dataset preprocessing jobs (host-CPU only, no TPU needed).
#
# Reference parity: slurms/dataset_scripts/{resize_jpeg,convert_proprio,
# rlds2lerobot,test_rlds_dataset}.sh — thin SBATCH wrappers around the
# python tools. Here one dispatcher covers all four; run it on any
# high-core host (TPU-VM host CPUs work well).
#
# Usage:
#   bash launchers/dataset_jobs.sh resize   <data_dir> <target_dir> [name]
#   bash launchers/dataset_jobs.sh proprio  <data_dir> <target_dir> [name]
#   bash launchers/dataset_jobs.sh lerobot  <data_dir> <out_dir>    [name]
#   bash launchers/dataset_jobs.sh smoke    <data_dir> [mix]
# Extra args pass through (e.g. --workers 45 --image-size 224 --limit 100).
set -euo pipefail

JOB=${1:?usage: dataset_jobs.sh resize|proprio|lerobot|smoke ...}
shift

export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd):${PYTHONPATH:-}"
# conversions open many shard files in parallel (reference bumps to 20k)
ulimit -n 20000 2>/dev/null || true

case "$JOB" in
    resize)   # re-encode images at 224px jpeg (reference resize_jpeg.sh)
        IN=${1:?data_dir} ; OUT=${2:?target_dir} ; DS=${3:-bridge_dataset}
        exec python scripts/dataset/modify_rlds_dataset.py \
            --data-dir "$IN" --target-dir "$OUT" --name "$DS" \
            --mods resize_and_jpeg_encode "${@:4}"
        ;;
    proprio)  # quat -> euler proprio conversion (reference convert_proprio.sh)
        IN=${1:?data_dir} ; OUT=${2:?target_dir} ; DS=${3:-bridge_dataset}
        exec python scripts/dataset/modify_rlds_dataset.py \
            --data-dir "$IN" --target-dir "$OUT" --name "$DS" \
            --mods proprio_quat_to_euler "${@:4}"
        ;;
    lerobot)  # RLDS -> LeRobot v2.0 export (reference rlds2lerobot.sh)
        IN=${1:?data_dir} ; OUT=${2:?out_dir} ; DS=${3:-bridge_dataset}
        exec python scripts/dataset/rlds2lerobot.py \
            --data-dir "$IN" --out "$OUT" --name "$DS" "${@:4}"
        ;;
    smoke)    # iterate the train pipeline, count transitions
        DATA=${1:?data_dir} ; MIX=${2:-bridge}
        exec python scripts/dataset/count_transitions.py \
            --data-dir "$DATA" --mix "$MIX" "${@:3}"
        ;;
    *)
        echo "unknown job '$JOB' (resize|proprio|lerobot|smoke)" >&2
        exit 2
        ;;
esac
