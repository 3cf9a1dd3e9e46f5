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


def _axis_weights(starts: jnp.ndarray, bin_size: jnp.ndarray, s: int, sr: int,
                  size: int) -> jnp.ndarray:
    """Per-roi interpolation weights along one axis: (N, S, size).

    Row (n, i) holds the averaged bilinear weights of bin i's ``sr`` sample
    points against the ``size`` feature columns — bilinear sampling is
    separable-linear, so the sr-average folds into the weights exactly.
    Border semantics match the roi_align kernel: points with coord < -1 or
    > size contribute zero; otherwise coords clamp to [0, size-1].
    """
    n = starts.shape[0]
    iy = (jnp.arange(s, dtype=jnp.float32)[:, None]
          + (jnp.arange(sr, dtype=jnp.float32)[None, :] + 0.5) / sr).reshape(-1)
    pts = starts[:, None] + iy[None, :] * bin_size[:, None]  # (N, S*sr)
    outside = (pts < -1.0) | (pts > float(size))
    p = jnp.clip(pts, 0.0, size - 1.0)
    i0 = jnp.floor(p)
    f = p - i0
    i1 = jnp.minimum(i0 + 1.0, size - 1.0)
    grid = jnp.arange(size, dtype=jnp.float32)  # (size,)
    w = ((grid == i0[..., None]) * (1.0 - f[..., None])
         + (grid == i1[..., None]) * f[..., None])  # (N, S*sr, size)
    # i0 == i1 at the top border: both terms hit the same column, (1-f)+f=1 ✓
    w = jnp.where(outside[..., None], 0.0, w)
    return w.reshape(n, s, sr, size).mean(axis=2)  # (N, S, size)


def roi_align(
    feat: jnp.ndarray,
    boxes: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
) -> jnp.ndarray:
    """RoIAlign one image: feat (H, W, C), boxes (N, 4) -> (N, S, S, C).

    TPU-native formulation: bilinear sampling becomes two dense einsums with
    per-roi one-hot-pair weight matrices (2 nonzeros per row), so the work
    runs on the MXU instead of pointwise gathers — the gather version
    measured 22.9 ms for 1000 rois on v5e; this is dense ~12 GFLOP.
    Numerically exact vs the torchvision kernel (aligned=False semantics).
    """
    h, w, _ = feat.shape
    s = output_size
    b = boxes * spatial_scale
    x1, y1 = b[:, 0], b[:, 1]
    roi_w = jnp.maximum(b[:, 2] - x1, 1.0)
    roi_h = jnp.maximum(b[:, 3] - y1, 1.0)

    wy = _axis_weights(y1, roi_h / s, s, sampling_ratio, h)  # (N, S, H)
    wx = _axis_weights(x1, roi_w / s, s, sampling_ratio, w)  # (N, S, W)
    wy = wy.astype(feat.dtype)
    wx = wx.astype(feat.dtype)
    # rows: (N, S, H) x (H, W, C) -> (N, S, W, C); cols contract W per roi
    inter = jnp.einsum("nsh,hwc->nswc", wy, feat,
                       preferred_element_type=jnp.float32)
    out = jnp.einsum("nxw,nswc->nsxc", wx, inter.astype(feat.dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(feat.dtype)


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
