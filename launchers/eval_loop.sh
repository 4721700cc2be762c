#!/usr/bin/env bash
# Launch N policy-server + simulator-client pairs on free ports.
#
# Reference parity: doc/evaluation.md "Eval Loop" runs BATCH_SIZE=4 pairs
# per GPU on random free ports. On TPU you normally want ONE batching
# server (it fuses all clients) — set SERVERS=1 CLIENTS=N — but the
# pair-per-port mode is kept for protocol-compatible A/B runs.
#
# Usage:
#   SERVERS=1 CLIENTS=4 bash launchers/eval_loop.sh config/experiment/simpler/pi0_finetune_bridge_ev.yaml
set -uo pipefail

CONFIG=${1:?usage: eval_loop.sh <eval_config.yaml>}
SERVERS=${SERVERS:-1}
CLIENTS=${CLIENTS:-4}

export PYTHONPATH="$(cd "$(dirname "$0")/.." && pwd):${PYTHONPATH:-}"
export VLA_LOG_DIR=${VLA_LOG_DIR:-log}

find_port() {  # idle-port finding, reference doc/evaluation.md
    python - <<'EOF'
import random, socket
ports = list(range(10000, 65500)); random.shuffle(ports)
for p in ports:
    with socket.socket() as s:
        try:
            s.bind(("", p)); print(p); break
        except OSError:
            continue
EOF
}

PIDS=()
PORTS=()
for i in $(seq 1 "$SERVERS"); do
    PORT=$(find_port)
    PORTS+=("$PORT")
    python -m intact_tpu.run --config_path "$CONFIG" \
        --eval_cfg.role server --eval_cfg.port "$PORT" &
    PIDS+=($!)
    echo "server $i on port $PORT (pid ${PIDS[-1]})"
done

sleep 5
for i in $(seq 1 "$CLIENTS"); do
    PORT=${PORTS[$(( (i - 1) % SERVERS ))]}
    python -m intact_tpu.run --config_path "$CONFIG" \
        --eval_cfg.role client --eval_cfg.port "$PORT" &
    PIDS+=($!)
    echo "client $i -> port $PORT (pid ${PIDS[-1]})"
done

trap 'kill "${PIDS[@]}" 2>/dev/null' EXIT
wait
