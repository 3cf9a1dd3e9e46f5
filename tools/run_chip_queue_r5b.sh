#!/bin/bash
# Phase-2 round-5 chip queue: dynamic follow-ons that depend on phase-1
# results (run_chip_queue_r5.sh). Waits until the phase-1 queue logs
# "queue done" in watch_r5.log, then executes lines appended to
# results/chip_queue/queue_b.txt one at a time (each line is a bash
# command), logging progress to results/chip_queue/queue_b.log.
#
# Keeps polling for new lines so later analysis can append more jobs; a
# literal line "QUIT" ends the loop. ONE tpu client at a time is preserved:
# this runs strictly after phase 1 and strictly serially.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site${PYTHONPATH:+:$PYTHONPATH}"
OUT=results/chip_queue
Q="$OUT/queue_b.txt"
LOG="$OUT/queue_b.log"
IDX="$OUT/queue_b.idx"
mkdir -p "$OUT"
touch "$Q"
[ -f "$IDX" ] || echo 0 > "$IDX"
stamp() { date +%H:%M:%S; }

echo "[$(stamp)] phase-2 queue: waiting for phase 1" >> "$LOG"
until grep -q "queue done" "$OUT/watch_r5.log" 2>/dev/null; do sleep 60; done
echo "[$(stamp)] phase 1 done; processing $Q" >> "$LOG"

while true; do
    n=$(cat "$IDX")
    total=$(grep -c . "$Q" || true)
    if [ "$total" -le "$n" ]; then sleep 60; continue; fi
    line=$(grep . "$Q" | sed -n "$((n + 1))p")
    if [ "$line" = "QUIT" ]; then
        echo "[$(stamp)] QUIT" >> "$LOG"
        break
    fi
    echo "[$(stamp)] job $((n + 1)): $line" >> "$LOG"
    bash -c "$line" >> "$LOG" 2>&1
    echo "[$(stamp)]   exit=$?" >> "$LOG"
    echo $((n + 1)) > "$IDX"
done
echo "[$(stamp)] phase-2 queue done" >> "$LOG"
