#!/bin/bash
# Patient axon-tunnel watcher: poll the relay ports until they accept,
# confirm jax.devices() actually answers, then run the serialized chip
# validation + bench queue (tools/run_chip_queue.sh). Single process, no
# stacked TPU clients (each hung client may queue a claim on the relay).
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_queue/watch.log
mkdir -p results/chip_queue
stamp() { date +%H:%M:%S; }
echo "[$(stamp)] watcher start" >> "$LOG"
while true; do
  if timeout 5 bash -c 'exec 3<>/dev/tcp/127.0.0.1/8082' 2>/dev/null; then
    echo "[$(stamp)] port 8082 open; probing jax.devices()" >> "$LOG"
    sleep 20
    if timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1; then
      echo "[$(stamp)] chip is back; running queue" >> "$LOG"
      break
    fi
    echo "[$(stamp)] probe failed; re-polling in 120s" >> "$LOG"
    sleep 120
  else
    sleep 60
  fi
done
bash tools/run_chip_queue.sh >> "$LOG" 2>&1
echo "[$(stamp)] watcher done" >> "$LOG"
