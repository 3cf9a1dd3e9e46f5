#!/usr/bin/env python
"""Train the cls task network on frozen-SwinIR restored images.

Parity: reference ``main/cls/train_swinir.py`` (see SURVEY.md §2.6).
"""
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import argparse

from edtr_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--debug", action="store_true")
    p.add_argument("--seed", type=int, default=None)

    args = p.parse_args()
    from edtr_tpu.train.runner import task_train
    task_train(args.config, task="cls", recipe="swinir", debug=args.debug, seed=args.seed)


if __name__ == "__main__":
    main()
