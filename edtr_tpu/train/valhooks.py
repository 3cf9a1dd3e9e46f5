"""In-training validation + periodic image dumps.

Parity: the val / image blocks every reference train script carries
(``main/det/train_edtr.py:276-362`` — image grids of gt/lq/pre/restored and
per-image validation with CocoEvaluator mid-training; mirrored in
``main/det/train_swinir.py:141-199`` etc.). ``--debug`` short-circuits the
``% every`` conditions exactly like the reference (:253,295).
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def save_image_grid(img_dir: str, step: int, rows: Dict[str, np.ndarray],
                    max_cols: int = 4) -> str:
    """PNG grid: one row per named tensor (B,H,W,3) in [0,1], columns are
    batch samples. Reference: torchvision ``make_grid`` dumps of
    gt/lq/pre_restored/restored (main/det/train_edtr.py:276-292)."""
    from PIL import Image

    names = list(rows)
    cols = min(max_cols, min(np.asarray(v).shape[0] for v in rows.values()))
    h = min(int(np.asarray(v).shape[1]) for v in rows.values())
    w = min(int(np.asarray(v).shape[2]) for v in rows.values())
    grid = np.zeros((len(names) * h, cols * w, 3), np.uint8)
    for r, name in enumerate(names):
        arr = np.clip(np.nan_to_num(np.asarray(rows[name], np.float32)), 0, 1)
        for c in range(cols):
            grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = (
                arr[c, :h, :w] * 255).astype(np.uint8)
    os.makedirs(img_dir, exist_ok=True)
    path = os.path.join(img_dir, f"step_{step:07d}.png")
    Image.fromarray(grid).save(path)
    return path


def validate_detection(dataset, det_fn, det_params, key,
                       restore_fn: Optional[Callable] = None,
                       max_images: Optional[int] = None,
                       img_size: int = 512) -> Dict[str, float]:
    """Per-image (bs=1) detection validation: [restore ->] detect -> COCO mAP
    (+PSNR when restoring). Parity: ``main/det/train_edtr.py:295-362``."""
    from edtr_tpu.data.coco import gt_from_dataset
    from edtr_tpu.train.harness import list_to_batch
    from edtr_tpu.utils.coco_eval import CocoEvaluator
    from edtr_tpu.utils.image import calculate_psnr

    evaluator = CocoEvaluator(gt_from_dataset(dataset))
    n = min(len(dataset), max_images or len(dataset))
    psnrs = []
    for i in range(n):
        gt, lq, annot, _ = dataset[i]
        h, w = gt.shape[:2]
        x = jnp.asarray(list_to_batch([lq], img_size))
        if restore_fn is not None:
            key, sub = jax.random.split(key)
            x = restore_fn(x, sub)
            gt_b = jnp.asarray(list_to_batch([gt], img_size))
            psnrs.append(float(calculate_psnr(x[:, :h, :w], gt_b[:, :h, :w])[0]))
        dets = det_fn(det_params, x)
        valid = np.asarray(dets["valid"][0])
        evaluator.update({
            annot["image_id"]: dict(
                boxes=np.asarray(dets["boxes"][0])[valid],
                scores=np.asarray(dets["scores"][0])[valid],
                labels=np.asarray(dets["labels"][0])[valid],
            )
        })
    evaluator.synchronize_between_processes()
    evaluator.accumulate()
    stats = evaluator.summarize(verbose=False)
    if psnrs:
        stats["psnr"] = float(np.mean(psnrs))
    return stats


def validate_task(task: str, dataset, net_apply, net_vars, key,
                  restore_fn: Optional[Callable] = None,
                  max_images: Optional[int] = None) -> Dict[str, float]:
    """cls/seg validation: [restore ->] task net -> top-1 / mIoU (+PSNR).

    Parity: the val blocks of main/{cls,seg}/train_*.py.
    """
    from edtr_tpu.utils.image import calculate_psnr
    from edtr_tpu.utils.metrics import compute_iou, confusion_matrix, topk_accuracy

    n = min(len(dataset), max_images or len(dataset))
    psnrs, correct, total, mats = [], 0, 0, None
    for i in range(n):
        gt, lq, target, _ = dataset[i]
        x = jnp.asarray(lq)[None]
        if restore_fn is not None:
            key, sub = jax.random.split(key)
            x = restore_fn(x, sub)
            psnrs.append(float(calculate_psnr(x, jnp.asarray(gt)[None])[0]))
        out = net_apply(net_vars, x)
        if task == "cls":
            correct += int(topk_accuracy(out, jnp.asarray([target]))[0])
            total += 1
        else:
            pred = np.asarray(out["out"].argmax(-1))[0]
            m = confusion_matrix(pred, np.asarray(target), out["out"].shape[-1])
            mats = m if mats is None else mats + m
    stats: Dict[str, float] = {}
    if psnrs:
        stats["psnr"] = float(np.mean(psnrs))
    if task == "cls":
        stats["top1"] = correct / max(total, 1)
    elif mats is not None:
        _, stats["miou"] = compute_iou(mats)
    return stats


def log_val_stats(logger, writer, step: int, stats: Dict[str, float],
                  prefix: str = "val") -> None:
    logger(f"{prefix} @ step {step}: "
           + " ".join(f"{k}={v:.4f}" for k, v in stats.items()
                      if isinstance(v, float)))
    if writer:
        for k, v in stats.items():
            if isinstance(v, (int, float)):
                writer.add_scalar(f"{prefix}/{k}", v, step)
