"""Task metrics: top-k accuracy, segmentation confusion matrix / mIoU.

Parity:
  topk accuracy      -> utils/classification.py:45-61
  calculate_mat/IoU  -> utils/segmentation.py:99-108
  PSNR               -> edtr_tpu.utils.image.calculate_psnr (utils/common.py:220-249)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def topk_accuracy(
    logits: jnp.ndarray, labels: jnp.ndarray, topk: Sequence[int] = (1,)
):
    """Per-batch correct counts for each k; parity utils/classification.py:45-61."""
    maxk = max(topk)
    pred = jnp.argsort(-logits, axis=-1)[:, :maxk]  # (B, maxk)
    correct = pred == labels[:, None]
    return [jnp.sum(jnp.any(correct[:, :k], axis=1)) for k in topk]


def confusion_matrix(
    pred: np.ndarray, target: np.ndarray, num_classes: int, ignore_index: int = 255
) -> np.ndarray:
    """(C, C) confusion matrix; parity ``calculate_mat`` (utils/segmentation.py:99-103)."""
    mask = target != ignore_index
    t = target[mask].astype(np.int64)
    p = pred[mask].astype(np.int64)
    idx = t * num_classes + p
    mat = np.bincount(idx, minlength=num_classes ** 2).reshape(num_classes, num_classes)
    return mat


def compute_iou(mat: np.ndarray) -> Tuple[np.ndarray, float]:
    """Per-class IoU + mean; parity ``compute_iou`` (utils/segmentation.py:105-108)."""
    inter = np.diag(mat).astype(np.float64)
    union = mat.sum(0) + mat.sum(1) - inter
    iou = inter / np.maximum(union, 1)
    return iou, float(iou.mean())
