#!/usr/bin/env python
"""DiffBIR evaluation (det): 50-step restoration + task metric.

Parity: reference ``main/det/test_diffbir.py``.
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=231)
    args = p.parse_args()
    from edtr_tpu.train.runner import diffbir_eval
    diffbir_eval(args.config, task="det", debug=args.debug, seed=args.seed)


if __name__ == "__main__":
    main()
