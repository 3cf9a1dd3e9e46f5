"""Logging / experiment environment.

Parity (/root/reference):
  Logger (rank-0 console INFO + file DEBUG)   -> utils/common.py:51-77
  copy_opt_file (config self-archival)        -> utils/common.py:37-48
  prepare_environment (dirs, seed, fp16 note) -> utils/detection.py:28-68
  TensorBoard scalars/images                  -> main/*/train_*.py (here a
     JSONL scalar writer + optional torch TensorBoard if importable)
"""

from __future__ import annotations

import json
import logging
import os
import random
import sys
import time
from typing import Optional

import numpy as np


class Logger:
    """Process-0-gated logger: console INFO + file DEBUG."""

    def __init__(self, log_dir: Optional[str] = None, name: str = "edtr_tpu"):
        import jax

        self.is_main = jax.process_index() == 0
        self._logger = logging.getLogger(name)
        self._logger.setLevel(logging.DEBUG)
        self._logger.handlers.clear()
        if self.is_main:
            sh = logging.StreamHandler(sys.stdout)
            sh.setLevel(logging.INFO)
            sh.setFormatter(logging.Formatter("%(asctime)s %(levelname)s: %(message)s"))
            self._logger.addHandler(sh)
            if log_dir:
                os.makedirs(log_dir, exist_ok=True)
                fh = logging.FileHandler(os.path.join(log_dir, "run.log"))
                fh.setLevel(logging.DEBUG)
                fh.setFormatter(
                    logging.Formatter("%(asctime)s %(levelname)s: %(message)s")
                )
                self._logger.addHandler(fh)

    def __call__(self, msg: str, level: str = "info") -> None:
        if self.is_main:
            getattr(self._logger, level)(msg)

    info = __call__


class ScalarWriter:
    """JSONL scalar log (+ optional TensorBoard when available)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        self._f.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_image(self, tag: str, image_hwc, step: int) -> None:
        path = os.path.join(os.path.dirname(self._f.name), f"{tag.replace('/', '_')}_{step}.png")
        _save_png(path, image_hwc)
        if self._tb is not None:
            self._tb.add_image(tag, np.asarray(image_hwc).transpose(2, 0, 1), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


def _save_png(path: str, image_hwc) -> None:
    from PIL import Image

    arr = np.asarray(image_hwc)
    arr = np.clip(arr * 255.0 if arr.dtype != np.uint8 else arr, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def copy_opt_file(cfg_path: str, exp_dir: str) -> None:
    """Archive the config with timestamp + launch command header.

    Parity: ``copy_opt_file`` (utils/common.py:37-48).
    """
    import shutil

    os.makedirs(exp_dir, exist_ok=True)
    filename = os.path.join(exp_dir, os.path.basename(cfg_path))
    shutil.copyfile(cfg_path, filename)
    cmd = " ".join(sys.argv)
    stamp = time.strftime("%Y%m%d_%H%M%S", time.localtime())
    with open(filename, "r+") as f:
        content = f.read()
        f.seek(0)
        f.write(f"# GENERATE TIME: {stamp}\n# CMD: {cmd}\n\n{content}")


def set_seed(seed: int) -> None:
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass


def prepare_environment(cfg, cfg_path: Optional[str] = None, seed: Optional[int] = None):
    """Experiment dirs + seed + logger + config archive.

    Parity: ``prepare_environment`` (utils/detection.py:28-68; near-identical
    clones in utils/classification.py:7-42, utils/segmentation.py:8-48 —
    centralized here).
    Returns (exp_dir, ckpt_dir, img_dir, logger, writer).

    Multi-process launches (the reference's ``accelerate launch``,
    script.sh:26,42) connect to the JAX coordinator here, BEFORE any device
    use, so every entry point becomes multi-process-capable through its
    normal setup path (env-gated: EDTR_COORDINATOR/EDTR_NUM_PROCESSES/
    EDTR_PROCESS_ID or the standard JAX_* equivalents).
    """
    from edtr_tpu.parallel.distributed import maybe_initialize_distributed

    maybe_initialize_distributed()
    train_cfg = cfg.get("train", cfg)
    exp_dir = train_cfg.get("exp_dir", "experiments/run")
    ckpt_dir = os.path.join(exp_dir, "checkpoints")
    img_dir = os.path.join(exp_dir, "images")
    for d in (exp_dir, ckpt_dir, img_dir):
        os.makedirs(d, exist_ok=True)
    set_seed(seed if seed is not None else train_cfg.get("seed", 231))
    logger = Logger(exp_dir)
    writer = ScalarWriter(os.path.join(exp_dir, "logs")) if logger.is_main else None
    if cfg_path:
        copy_opt_file(cfg_path, exp_dir)
    precision = train_cfg.get("precision", "bf16")
    logger(f"experiment dir: {exp_dir} (precision: {precision} on TPU)")
    return exp_dir, ckpt_dir, img_dir, logger, writer
