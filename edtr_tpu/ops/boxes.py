"""Box operations with XLA-friendly static shapes.

TPU-native equivalents of ``torchvision.ops.boxes`` as used by the reference
detection stack (``model/faster_rcnn.py:9-10``): on GPU these are C++/CUDA
kernels inside torchvision; here they are pure jnp with fixed-size padded box
tensors + validity masks (SURVEY.md §7 "hard parts": no dynamic shapes).

Boxes are (x1, y1, x2, y2) in pixels, arrays of shape (..., N, 4).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# torchvision defaults (model/faster_rcnn.py:641-744 BoxCoder usage)
BBOX_XFORM_CLIP = float(jnp.log(1000.0 / 16))


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a (N,4), b (M,4) -> (N,M)."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    return inter / jnp.maximum(area_a + area_b - inter, 1e-9)


def clip_boxes_to_image(boxes: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with BOTH sides >= min_size (torchvision remove_small_boxes)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


# -- BoxCoder -------------------------------------------------------------------

def encode_boxes(
    reference: jnp.ndarray, proposals: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """Encode gt ``reference`` against ``proposals`` -> deltas.

    Parity: ``BoxCoder.encode`` (``model/util.py:641``-, torchvision math).
    """
    wx, wy, ww, wh = weights
    px1, py1, px2, py2 = jnp.split(proposals, 4, axis=-1)
    gx1, gy1, gx2, gy2 = jnp.split(reference, 4, axis=-1)
    pw = px2 - px1
    ph = py2 - py1
    pcx = px1 + 0.5 * pw
    pcy = py1 + 0.5 * ph
    gw = gx2 - gx1
    gh = gy2 - gy1
    gcx = gx1 + 0.5 * gw
    gcy = gy1 + 0.5 * gh
    dx = wx * (gcx - pcx) / jnp.maximum(pw, 1e-9)
    dy = wy * (gcy - pcy) / jnp.maximum(ph, 1e-9)
    dw = ww * jnp.log(jnp.maximum(gw, 1e-9) / jnp.maximum(pw, 1e-9))
    dh = wh * jnp.log(jnp.maximum(gh, 1e-9) / jnp.maximum(ph, 1e-9))
    return jnp.concatenate([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray, boxes: jnp.ndarray, weights=(1.0, 1.0, 1.0, 1.0)
) -> jnp.ndarray:
    """Apply deltas to anchors/proposals; parity ``BoxCoder.decode``.

    deltas: (..., N, K*4) for K classes; boxes: (..., N, 4).
    Returns (..., N, K, 4).
    """
    wx, wy, ww, wh = weights
    shape = deltas.shape
    k = shape[-1] // 4
    deltas = deltas.reshape(shape[:-1] + (k, 4))
    pw = (boxes[..., 2] - boxes[..., 0])[..., None]
    ph = (boxes[..., 3] - boxes[..., 1])[..., None]
    pcx = boxes[..., 0][..., None] + 0.5 * pw
    pcy = boxes[..., 1][..., None] + 0.5 * ph
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, None, BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, None, BBOX_XFORM_CLIP)
    cx = dx * pw + pcx
    cy = dy * ph + pcy
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    out = jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )
    return out  # (..., N, K, 4)


# -- NMS ----------------------------------------------------------------------

NMS_CHUNK = 256
# column-block width for the packed suppression build: one (N, COL_BLOCK)
# fp32 IoU slab lives at a time instead of the whole (N, N) matrix
_NMS_COL_BLOCK = 128


def _pack_bits(bits: jnp.ndarray) -> jnp.ndarray:
    """(..., 32*W) bool -> (..., W) uint32, bit k of word w = column w*32+k."""
    # weights built inline: caching the array would leak a tracer when the
    # first call happens under a jit/scan trace
    weights = jnp.left_shift(jnp.uint32(1), jnp.arange(32, dtype=jnp.uint32))
    shape = bits.shape[:-1]
    w = bits.reshape(shape + (-1, 32)).astype(jnp.uint32)
    return jnp.sum(w * weights, axis=-1, dtype=jnp.uint32)


def _fixpoint_keep(sv, sup_apply, n_iter):
    """Iterate ``keep <- valid & ~suppressed_by_kept(keep)`` to fixpoint.

    The greedy-NMS solution is the unique fixpoint (induction over score
    order) and convergence takes max-suppression-chain-depth iterations —
    a handful in practice, vs N sequential steps for scalar greedy.
    """

    def cond(st):
        keep, prev, it = st
        return jnp.logical_and(it < n_iter, jnp.any(keep != prev))

    def body(st):
        keep, _, it = st
        return sv & ~sup_apply(keep), keep, it + 1

    keep, _, _ = jax.lax.while_loop(
        cond, body, (sv, jnp.zeros_like(sv), jnp.asarray(0, jnp.int32)))
    return keep


def _packed_keep(sb, sv, iou_threshold):
    """Fixpoint NMS with a BIT-PACKED suppression matrix (VERDICT r4 #6).

    The dense formulation materializes an (N, N) fp32 IoU + bool sup matrix
    per (image, class) — 80 MB/img for the box head at N=1000, C=21, which
    forced serving batches >8 through a sequential ``lax.map`` crutch.
    Here the IoU is computed in (N, 128)-column slabs under a ``lax.scan``
    and immediately packed to uint32 words, so the resident state is the
    (N, N/32) uint32 mask (125 KB at N=1024, a 32x cut) and the largest
    transient is one fp32 slab. Same greedy fixpoint, bit-exact keep set.
    """
    n = sb.shape[0]
    pad = -n % _NMS_COL_BLOCK
    m = n + pad
    if pad:
        sb = jnp.pad(sb, ((0, pad), (0, 0)))
        sv = jnp.pad(sv, (0, pad))
    nw = m // 32
    rows = jnp.arange(m)

    def col_block(_, j):
        cols_b = jax.lax.dynamic_slice(sb, (j, 0), (_NMS_COL_BLOCK, 4))
        cols_v = jax.lax.dynamic_slice(sv, (j,), (_NMS_COL_BLOCK,))
        iou = box_iou(sb, cols_b)                       # (m, COL_BLOCK) fp32
        earlier = (j + jnp.arange(_NMS_COL_BLOCK))[None, :] < rows[:, None]
        bits = (iou > iou_threshold) & earlier & cols_v[None, :]
        return None, _pack_bits(bits)                   # (m, COL_BLOCK/32)

    _, sup = jax.lax.scan(
        col_block, None, jnp.arange(0, m, _NMS_COL_BLOCK, dtype=jnp.int32))
    sup = sup.transpose(1, 0, 2).reshape(m, nw)         # (m, nw) uint32

    def sup_apply(keep):
        kp = _pack_bits(keep)                           # (nw,) uint32
        return jnp.any((sup & kp[None, :]) != 0, axis=1)

    return _fixpoint_keep(sv, sup_apply, m)[:n]


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray = None,
    chunk: int = NMS_CHUNK,  # kept for API compat; unused
) -> jnp.ndarray:
    """Greedy NMS keep-mask over fixed-size (N,4)/(N,) inputs — exact.

    Fixpoint formulation (the TPU-native recipe, cf. TF's TPU
    non_max_suppression): sort by score, build the upper-triangular
    "j-can-suppress-i" overlap structure once, then iterate
    ``keep <- valid & ~any(sup & keep)`` under ``lax.while_loop`` until
    unchanged — max-suppression-chain-depth iterations (a handful in
    practice) instead of N sequential steps, measured ~5x over the chunked
    sequential kernel at N=1000.

    N <= NMS_CHUNK keeps the dense (N, N) bool matrix (cheapest at small N);
    larger N uses the bit-packed build (:func:`_packed_keep`) whose resident
    state is N²/32 BITS, so the box head's (B, C-1)-way vmap runs at
    bs16 without the old per-image ``lax.map`` chunk crutch.
    Returns a boolean keep mask aligned with the (unsorted) inputs.
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))
    sb = boxes[order]
    sv = valid[order]

    if n > NMS_CHUNK:
        keep = _packed_keep(sb, sv, iou_threshold)
    else:
        iou = box_iou(sb, sb)
        earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
        sup = (iou > iou_threshold) & earlier & sv[None, :]
        keep = _fixpoint_keep(
            sv, lambda k: jnp.any(sup & k[None, :], axis=1), n)
    return jnp.zeros((n,), bool).at[order].set(keep)


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray = None,
) -> jnp.ndarray:
    """Category-aware NMS via the coordinate-offset trick (torchvision's
    ``batched_nms``): boxes of different ``idxs`` never overlap."""
    max_coord = jnp.max(jnp.where(valid[:, None] if valid is not None else True, boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid)


def top_k_by_score(
    scores: jnp.ndarray, k: int, valid: jnp.ndarray = None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices + validity of the top-k scores (invalid -> -inf)."""
    masked = scores if valid is None else jnp.where(valid, scores, -jnp.inf)
    vals, idx = jax.lax.top_k(masked, k)
    return idx, jnp.isfinite(vals)
