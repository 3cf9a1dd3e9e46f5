#!/bin/bash
# Patient axon-tunnel watcher (round 5): poll until jax.devices() answers,
# then run the serialized round-5 measurement queue. Single process.
set -u
cd "$(dirname "$0")/.."
LOG=results/chip_queue/watch_r5.log
mkdir -p results/chip_queue
stamp() { date +%H:%M:%S; }
echo "[$(stamp)] r5 watcher start" >> "$LOG"
while true; do
  if timeout 300 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256,256), jnp.bfloat16)
assert float((x@x).sum()) > 0
print(jax.devices())" >> "$LOG" 2>&1; then
    echo "[$(stamp)] chip is back; running r5 queue" >> "$LOG"
    break
  fi
  echo "[$(stamp)] probe failed; re-polling in 120s" >> "$LOG"
  sleep 120
done
bash tools/run_chip_queue_r5.sh >> "$LOG" 2>&1
echo "[$(stamp)] r5 watcher done" >> "$LOG"
