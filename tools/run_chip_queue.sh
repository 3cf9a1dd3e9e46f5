#!/bin/bash
# On-chip measurement + validation + bench queue (round 4).
# Runs everything serially (ONE tpu client at a time — stacked clients
# queue claims against the relay), logging to results/chip_queue/.
#
#   bash tools/run_chip_queue.sh
#
# Order (VERDICT r3 "next round" tasks 1/2/5/6): measure per-shape kernel
# wins first, derive the dispatch table from them, A/B the table at stage
# level, then produce the driver-protocol bench twice (identical
# fused_kernels flags across runs = deterministic enablement), the
# REFERENCE-SEMANTICS bs16 train artifact (r3's queue accidentally ran
# global_bs=2), and a bs16 serving chain probe.
set -u
cd "$(dirname "$0")/.."
# repo root for edtr_tpu imports + the axon sitecustomize (its registration
# rides sys.path; replacing PYTHONPATH wholesale would drop the TPU backend)
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/chip_queue
mkdir -p "$OUT"
stamp() { date +%H:%M:%S; }

echo "[$(stamp)] 1/10 smoke_kernels_chip (fast numerics gate)"
timeout 900 python tools/smoke_kernels_chip.py > "$OUT/smoke.log" 2>&1
echo "  exit=$? tail:"; tail -2 "$OUT/smoke.log"

echo "[$(stamp)] 2/10 verify_chip (per-shape kernel wins + numerics, ~40 min)"
timeout 7200 python tools/verify_chip.py --out "$OUT/kernel_wins.json" \
    > "$OUT/verify_chip.log" 2>&1
echo "  exit=$? tail:"; tail -3 "$OUT/verify_chip.log"

echo "[$(stamp)] 3/10 make_dispatch_table"
python tools/make_dispatch_table.py "$OUT/kernel_wins.json" \
    --out "$OUT/dispatch_table.json" > /dev/null 2>&1
echo "  exit=$?"
# the standalone-winners table is the CANDIDATE set: only the e2e A/B
# (next step) runs with it, to re-check each round whether any standalone
# winner holds its win end-to-end. Everything after benches the SHIPPED
# built-in defaults (ops/dispatch.py — standalone AND e2e winners only).
if [ -s "$OUT/dispatch_table.json" ]; then
  export EDTR_KERNEL_TABLE="$PWD/$OUT/dispatch_table.json"
fi

echo "[$(stamp)] 4/10 ab_e2e (stage-level table-vs-off-vs-force, ~40 min)"
timeout 7200 python tools/ab_e2e.py --out "$OUT/ab_e2e.json" \
    > "$OUT/ab_e2e.log" 2>&1
echo "  exit=$? tail:"; tail -2 "$OUT/ab_e2e.log"
unset EDTR_KERNEL_TABLE

echo "[$(stamp)] 5/10 bench.py (driver protocol, run 1)"
timeout 3600 python bench.py > "$OUT/bench1.json" 2> "$OUT/bench1.log"
echo "  exit=$?"; cat "$OUT/bench1.json"

echo "[$(stamp)] 6/10 bench.py (run 2, reproducibility + identical flags)"
timeout 3600 python bench.py > "$OUT/bench2.json" 2> "$OUT/bench2.log"
echo "  exit=$?"; cat "$OUT/bench2.json"
python - <<'EOF'
import json
a = json.load(open("results/chip_queue/bench1.json"))
b = json.load(open("results/chip_queue/bench2.json"))
same = a.get("fused_kernels") == b.get("fused_kernels")
print(f"fused_kernels identical across runs: {same}")
print(f"img/s: run1 {a['value']}  run2 {b['value']}")
EOF

echo "[$(stamp)] 7/10 bench_train at REFERENCE semantics (global bs16 = 8x2)"
timeout 7200 env EDTR_TRAIN_BENCH_BATCH=16 EDTR_TRAIN_BENCH_ACCUM=8 \
    python tools/bench_train.py > "$OUT/bench_train_bs16.log" 2>&1
echo "  exit=$? tail:"; tail -1 "$OUT/bench_train_bs16.log"

echo "[$(stamp)] 8/10 bs16 serving chain (stage split at bs16)"
timeout 3600 env EDTR_BENCH_BATCH=16 EDTR_BENCH_ITERS=6 \
    python bench.py > "$OUT/bench_bs16.json" 2> "$OUT/bench_bs16.log"
echo "  exit=$?"; cat "$OUT/bench_bs16.json"

echo "[$(stamp)] 9/10 profile_scan (scan-stage sink localization, r3 weak #7)"
timeout 3600 python tools/profile_scan.py > "$OUT/profile_scan.json" \
    2> "$OUT/profile_scan.log"
echo "  exit=$?"; tail -c 400 "$OUT/profile_scan.json"

echo "[$(stamp)] 10/10 ab_scan (attention backend x sampler unroll)"
timeout 3600 python tools/ab_scan.py --out "$OUT/ab_scan.json" \
    > "$OUT/ab_scan.log" 2>&1
echo "  exit=$? tail:"; tail -2 "$OUT/ab_scan.log"

echo "[$(stamp)] queue done"
