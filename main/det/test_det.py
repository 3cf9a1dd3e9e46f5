#!/usr/bin/env python
"""Evaluate the plain det task network (PSNR + task metric).

Parity: reference ``main/det/test_det.py`` (see SURVEY.md §2.6).
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
    p.add_argument("--save-img", action="store_true")
    args = p.parse_args()
    from edtr_tpu.train.runner import edtr_eval
    edtr_eval(args.config, debug=args.debug, seed=args.seed or 231, save_img=args.save_img, calc_fd=getattr(args, 'calc_fd', False))


if __name__ == "__main__":
    main()
