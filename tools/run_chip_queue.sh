#!/bin/bash
# On-chip validation + bench queue for when the axon tunnel returns.
# Runs everything serially (ONE tpu client at a time — stacked clients
# queue claims against the relay), logging to results/chip_queue/.
#
#   bash tools/run_chip_queue.sh
#
# Order: fail-fast kernel validation first (verify_chip asserts numerics
# before any timing), then the per-level ResBlock prize measurement, then
# the driver-protocol bench twice, then the train/matrix artifacts.
set -u
cd "$(dirname "$0")/.."
OUT=results/chip_queue
mkdir -p "$OUT"
stamp() { date +%H:%M:%S; }

echo "[$(stamp)] 1/5 verify_chip (kernel numerics + timings, ~30-50 min)"
timeout 5400 python tools/verify_chip.py > "$OUT/verify_chip.log" 2>&1
echo "  exit=$? tail:"; tail -3 "$OUT/verify_chip.log"

echo "[$(stamp)] 2/5 bench_resblock (conv fusion prize per level)"
timeout 1800 python tools/bench_resblock.py > "$OUT/bench_resblock.log" 2>&1
echo "  exit=$? tail:"; tail -1 "$OUT/bench_resblock.log"

echo "[$(stamp)] 3/5 bench.py (driver protocol, run 1)"
timeout 3600 python bench.py > "$OUT/bench1.json" 2> "$OUT/bench1.log"
echo "  exit=$?"; cat "$OUT/bench1.json"

echo "[$(stamp)] 4/5 bench.py (run 2, reproducibility)"
timeout 3600 python bench.py > "$OUT/bench2.json" 2> "$OUT/bench2.log"
echo "  exit=$?"; cat "$OUT/bench2.json"

echo "[$(stamp)] 5/5 bench_train bs16"
timeout 5400 python tools/bench_train.py > "$OUT/bench_train.log" 2>&1
echo "  exit=$? tail:"; tail -1 "$OUT/bench_train.log"

echo "[$(stamp)] queue done"
