"""RoIAlign + multi-scale FPN pooling, XLA-native.

TPU equivalent of torchvision's CUDA ``roi_align`` / ``MultiScaleRoIAlign``
(used by the reference at ``model/faster_rcnn.py:9-10,342``): bilinear
sampling becomes batched gathers over NHWC features; the FPN level mapper is
computed per-RoI and levels are combined by masked sum (L is small — 2 for
the mobilenet FPN — so computing all levels and selecting is cheaper on TPU
than dynamic routing).

Semantics match ``roi_align(aligned=False)``: coords scaled by
``spatial_scale``, roi sizes clamped to >= 1, ``sampling_ratio`` sample
points per bin axis, average pooling, zero outside the feature map.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_sample(feat: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Sample feat (H, W, C) at float points (P,) -> (P, C); zero outside.

    Follows the roi_align kernel convention: points with y/x < -1 or > H/W
    are zero; points in [-1, 0] clamp to 0 (gradient-friendly border).
    """
    h, w, _ = feat.shape
    outside = (ys < -1.0) | (ys > h * 1.0) | (xs < -1.0) | (xs > w * 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    xs = jnp.clip(xs, 0.0, w - 1.0)
    y0 = jnp.floor(ys).astype(jnp.int32)
    x0 = jnp.floor(xs).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    ly = ys - y0
    lx = xs - x0
    hy = 1.0 - ly
    hx = 1.0 - lx

    def g(yi, xi):
        return feat[yi, xi]  # advanced indexing gather -> (P, C)

    val = (
        g(y0, x0) * (hy * hx)[:, None]
        + g(y0, x1) * (hy * lx)[:, None]
        + g(y1, x0) * (ly * hx)[:, None]
        + g(y1, x1) * (ly * lx)[:, None]
    )
    return jnp.where(outside[:, None], 0.0, val)


def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign one image: feat (H, W, C), boxes (N, 4) -> (N, S, S, C)."""
    n = boxes.shape[0]
    s = output_size
    sr = sampling_ratio
    b = boxes * spatial_scale
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(b[:, 3] - y1, 1.0)
    bin_w = roi_w / s
    bin_h = roi_h / s

    # sample grid: (S, SR) offsets per axis per roi
    iy = (jnp.arange(s)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr).reshape(-1)  # (S*SR,)
    ys = y1[:, None] + iy[None, :] * bin_h[:, None]  # (N, S*SR)
    xs = x1[:, None] + iy[None, :] * bin_w[:, None]
    # full 2-D grid: (N, S*SR, S*SR)
    yy = jnp.broadcast_to(ys[:, :, None], (n, s * sr, s * sr))
    xx = jnp.broadcast_to(xs[:, None, :], (n, s * sr, s * sr))
    pts_y = yy.reshape(n * s * sr * s * sr)
    pts_x = xx.reshape(n * s * sr * s * sr)
    sampled = _bilinear_sample(feat, pts_y, pts_x)  # (N*S*SR*S*SR, C)
    c = feat.shape[-1]
    sampled = sampled.reshape(n, s, sr, s, sr, c)
    return sampled.mean(axis=(2, 4))  # average the SRxSR samples per bin


def fpn_level_for_rois(
    boxes: jnp.ndarray, k_min: int, k_max: int, canonical_scale: int = 224,
    canonical_level: int = 4,
) -> jnp.ndarray:
    """torchvision LevelMapper: floor(k0 + log2(sqrt(area)/224))."""
    area = jnp.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 1e-6
    )
    target = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6))
    return jnp.clip(target, k_min, k_max).astype(jnp.int32) - k_min


def multiscale_roi_align(
    feats: Sequence[jnp.ndarray],
    boxes: jnp.ndarray,
    spatial_scales: Sequence[float],
    output_size: int = 7,
    sampling_ratio: int = 2,
    chunk: int = 128,
) -> jnp.ndarray:
    """Multi-level RoIAlign one image; feats are per-level (H_l, W_l, C).

    Parity: ``MultiScaleRoIAlign`` over FPN maps — each RoI pools from the
    level chosen by the area heuristic. All levels are computed and combined
    by mask (static shapes; L is 2-4). RoIs are processed in ``chunk``-sized
    groups under ``lax.map`` so the bilinear corner gathers stay bounded
    (~chunk * 49 * sr² * C floats instead of N's worth at once).
    """
    import math

    k_levels = [int(-math.log2(sc)) for sc in spatial_scales]

    def pool_chunk(boxes_c: jnp.ndarray) -> jnp.ndarray:
        levels = fpn_level_for_rois(boxes_c, k_levels[0], k_levels[-1])
        out = None
        for li, (feat, sc) in enumerate(zip(feats, spatial_scales)):
            pooled = roi_align(feat, boxes_c, sc, output_size, sampling_ratio)
            sel = (levels == li)[:, None, None, None]
            contrib = jnp.where(sel, pooled, 0.0)
            out = contrib if out is None else out + contrib
        return out

    n = boxes.shape[0]
    if n <= chunk:
        return pool_chunk(boxes)
    n_pad = (n + chunk - 1) // chunk * chunk
    boxes_p = jnp.pad(boxes, ((0, n_pad - n), (0, 0)))
    chunks = boxes_p.reshape(n_pad // chunk, chunk, 4)
    pooled = jax.lax.map(pool_chunk, chunks)
    return pooled.reshape(n_pad, output_size, output_size, -1)[:n]
