#!/bin/bash
# Round-5 on-chip measurement queue. Runs everything serially (ONE tpu
# client at a time — stacked clients queue claims against the relay),
# logging to results/chip_queue/.
#
#   bash tools/run_chip_queue_r5.sh [start_step]
#
# Order (VERDICT r4 "next round" tasks):
#   1 roofline_scan        — scan-stage roofline + wholekv attn variant (#1)
#   2 profile_swinir2      — price the SwinIR levers (#2)
#   3 ab_scan              — scan e2e A/B: wholekv vs online vs xla (#1)
#   4 profile_train        — remat-policy A/B + flash-bwd engagement (#4)
#   5 train_curve          — 100-step real-shape loss curves (#3b)
#   6 ab_e2e --size 1024   — disabled-kernel estate, big-image regime (#7)
#   7 ab_e2e swinir i50    — swin_block win vs noise floor (#8)
#   8 parity_run smoke     — keep the parity path warm (#9)
#   9 bench.py             — driver-protocol headline, new defaults
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/chip_queue
mkdir -p "$OUT"
START=${1:-1}
stamp() { date +%H:%M:%S; }

if [ "$START" -le 1 ]; then
echo "[$(stamp)] 1/9 roofline_scan"
EDTR_ROOF_ITERS=10 EDTR_ROOF_REP=16 timeout 7200 \
    python tools/roofline_scan.py > "$OUT/roofline_scan.log" 2> "$OUT/roofline_scan.progress"
echo "  exit=$?"; grep -o '{"metric": "scan roofline".*' "$OUT/roofline_scan.log" > "$OUT/roofline_scan.json" || true
fi

if [ "$START" -le 2 ]; then
echo "[$(stamp)] 2/9 profile_swinir2"
timeout 5400 python tools/profile_swinir2.py \
    > "$OUT/profile_swinir2.log" 2> "$OUT/profile_swinir2.progress"
echo "  exit=$?"; grep -o '{"metric": "swinir deep profile".*' "$OUT/profile_swinir2.log" > "$OUT/profile_swinir2.json" || true
fi

if [ "$START" -le 3 ]; then
echo "[$(stamp)] 3/9 ab_scan (wholekv / online / xla)"
timeout 7200 python tools/ab_scan.py --out "$OUT/ab_scan_r5.json" --iters 20 \
    > "$OUT/ab_scan_r5.log" 2>&1
echo "  exit=$?"; tail -2 "$OUT/ab_scan_r5.log"
fi

if [ "$START" -le 4 ]; then
echo "[$(stamp)] 4/9 profile_train (remat A/B, flash-bwd check)"
timeout 10800 python tools/profile_train.py \
    > "$OUT/profile_train.log" 2>&1
echo "  exit=$?"; grep -o '{"metric": "train profile".*' "$OUT/profile_train.log" > "$OUT/profile_train.json" || true
fi

if [ "$START" -le 5 ]; then
echo "[$(stamp)] 5/9 train_curve (100 steps, ~20 min)"
timeout 10800 python tools/train_curve.py > "$OUT/train_curve.log" 2>&1
echo "  exit=$?"; grep -o '{"metric": "flagship 512^2 train loss curves".*' "$OUT/train_curve.log" > "$OUT/train_curve.json" || true
fi

if [ "$START" -le 6 ]; then
echo "[$(stamp)] 6/9 ab_e2e 1024^2 bs1 (kernel estate)"
timeout 10800 python tools/ab_e2e.py --size 1024 --batch 1 \
    --stages vae_encode,scan,decode --iters 10 \
    --out "$OUT/ab_e2e_1024.json" > "$OUT/ab_e2e_1024.log" 2>&1
echo "  exit=$?"; tail -2 "$OUT/ab_e2e_1024.log"
fi

if [ "$START" -le 7 ]; then
echo "[$(stamp)] 7/9 ab_e2e swinir, 50 iters (swin_block vs noise)"
timeout 7200 python tools/ab_e2e.py --stages swinir --iters 50 \
    --out "$OUT/ab_e2e_swinir_i50.json" > "$OUT/ab_e2e_swinir_i50.log" 2>&1
echo "  exit=$?"; tail -2 "$OUT/ab_e2e_swinir_i50.log"
fi

if [ "$START" -le 8 ]; then
echo "[$(stamp)] 8/9 parity_run smoke"
timeout 3600 python tools/parity_run.py --config configs/det/voc2012/test/007_edtr-s4.yaml --image /tmp/parity_smoke.png --out results/parity > "$OUT/parity_smoke.log" 2>&1
echo "  exit=$?"; tail -2 "$OUT/parity_smoke.log"
fi

if [ "$START" -le 9 ]; then
echo "[$(stamp)] 9/9 bench (driver protocol)"
timeout 7200 python bench.py > "$OUT/bench_r5a.log" 2>&1
echo "  exit=$?"; tail -1 "$OUT/bench_r5a.log"
fi

echo "[$(stamp)] queue done"
