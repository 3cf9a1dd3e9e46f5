#!/bin/bash
# On-chip validation + bench queue for when the axon tunnel returns.
# Runs everything serially (ONE tpu client at a time — stacked clients
# queue claims against the relay), logging to results/chip_queue/.
#
#   bash tools/run_chip_queue.sh
#
# Order: the driver-protocol bench first (it is the artifact of record and
# its fail-safe kernel probe validates numerics before enabling any fused
# kernel), then the long verify_chip numerics+timing sweep, then the
# per-level ResBlock prize measurement and the train artifact.
set -u
cd "$(dirname "$0")/.."
# repo root for edtr_tpu imports + the axon sitecustomize (its registration
# rides sys.path; replacing PYTHONPATH wholesale would drop the TPU backend)
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/chip_queue
mkdir -p "$OUT"
stamp() { date +%H:%M:%S; }

echo "[$(stamp)] 1/6 smoke_kernels_chip (fast numerics gate)"
timeout 900 python tools/smoke_kernels_chip.py > "$OUT/smoke.log" 2>&1
echo "  exit=$? tail:"; tail -2 "$OUT/smoke.log"

echo "[$(stamp)] 2/6 bench.py (driver protocol, run 1)"
timeout 3600 python bench.py > "$OUT/bench1.json" 2> "$OUT/bench1.log"
echo "  exit=$?"; cat "$OUT/bench1.json"

echo "[$(stamp)] 3/6 bench.py (run 2, reproducibility)"
timeout 3600 python bench.py > "$OUT/bench2.json" 2> "$OUT/bench2.log"
echo "  exit=$?"; cat "$OUT/bench2.json"

echo "[$(stamp)] 4/6 verify_chip (kernel numerics + timings, ~30-50 min)"
timeout 5400 python tools/verify_chip.py > "$OUT/verify_chip.log" 2>&1
echo "  exit=$? tail:"; tail -3 "$OUT/verify_chip.log"

echo "[$(stamp)] 5/6 bench_resblock (conv fusion prize per level)"
timeout 1800 python tools/bench_resblock.py > "$OUT/bench_resblock.log" 2>&1
echo "  exit=$? tail:"; tail -1 "$OUT/bench_resblock.log"

echo "[$(stamp)] 6/6 bench_train bs16"
timeout 5400 python tools/bench_train.py > "$OUT/bench_train.log" 2>&1
echo "  exit=$? tail:"; tail -1 "$OUT/bench_train.log"

echo "[$(stamp)] queue done"
