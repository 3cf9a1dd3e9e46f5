#!/usr/bin/env python
"""Build a measured dispatch table from tools/verify_chip.py output.

    python tools/make_dispatch_table.py results/chip_queue/kernel_wins.json \
        [--out results/chip_queue/dispatch_table.json] [--thresh 1.05]

A shape ships fused only when its measured standalone speedup is at least
``--thresh`` (default 1.05: ties and sub-5% wins stay on XLA — simpler,
and run-to-run noise on the tunnel is a few percent). The output is the
``EDTR_KERNEL_TABLE`` format (family -> {shape_key: bool}); ``--python``
prints the literal for ops/dispatch.py:_BUILTIN instead.
"""

import argparse
import json


def build(wins: dict, thresh: float) -> dict:
    table = {}
    for fam, entries in wins.get("families", {}).items():
        table[fam] = {
            # error entries (shape-fail during measurement) ship off
            key: bool(e.get("speedup", 0.0) >= thresh)
            for key, e in sorted(entries.items())
        }
    return table


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("wins")
    ap.add_argument("--out", default=None)
    ap.add_argument("--thresh", type=float, default=1.05)
    ap.add_argument("--python", action="store_true")
    args = ap.parse_args()
    with open(args.wins) as f:
        wins = json.load(f)
    table = build(wins, args.thresh)
    text = json.dumps(table, indent=1, sort_keys=True)
    if args.python:
        for fam, entries in sorted(table.items()):
            print(f'    "{fam}": {{')
            for k, v in sorted(entries.items()):
                sp = wins["families"][fam][k]["speedup"]
                print(f'        "{k}": {v},  # {sp}x')
            print("    },")
        return
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")
    print(text)


if __name__ == "__main__":
    main()
