#!/usr/bin/env python
"""EDTR training (seg task).

Parity: reference ``main/seg/train_edtr.py`` (see SURVEY.md §2.6).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import argparse


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=None)
    args = p.parse_args()
    from edtr_tpu.train.runner import edtr_train_task
    edtr_train_task(args.config, task="seg", debug=args.debug, seed=args.seed)


if __name__ == "__main__":
    main()
