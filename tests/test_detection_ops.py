"""Unit tests: box ops, NMS, RoIAlign, matcher/sampler (static-shape kernels)."""

import jax
import jax.numpy as jnp
import numpy as np

from edtr_tpu.ops import boxes as B
from edtr_tpu.ops.roi_align import fpn_level_for_rois, roi_align


def test_box_iou_known_values():
    a = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    b = jnp.asarray([[0, 0, 10, 10], [5, 5, 15, 15]], jnp.float32)
    iou = np.asarray(B.box_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(iou[0, 1], 25 / 175, rtol=1e-5)
    np.testing.assert_allclose(iou[1, 1], 0.0, atol=1e-7)


def test_encode_decode_roundtrip():
    g = np.random.default_rng(0)
    props = jnp.asarray(np.abs(g.random((8, 4))) * 50, jnp.float32)
    props = props.at[:, 2:].set(props[:, :2] + 10 + props[:, 2:])
    gt = props + jnp.asarray(g.normal(0, 2, (8, 4)), jnp.float32)
    weights = (10.0, 10.0, 5.0, 5.0)
    deltas = B.encode_boxes(gt, props, weights)
    rec = B.decode_boxes(deltas, props, weights).reshape(8, 4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(gt), rtol=1e-3, atol=1e-3)


def test_nms_greedy_semantics():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [20, 20, 30, 30], [21, 21, 31, 31]],
        jnp.float32,
    )
    scores = jnp.asarray([0.9, 0.8, 0.7, 0.95], jnp.float32)
    keep = np.asarray(B.nms_mask(boxes, scores, 0.5))
    # box 0 suppresses 1; box 3 suppresses 2
    np.testing.assert_array_equal(keep, [True, False, False, True])


def test_batched_nms_respects_classes():
    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8], jnp.float32)
    same = np.asarray(B.batched_nms_mask(boxes, scores, jnp.asarray([1, 1]), 0.5))
    diff = np.asarray(B.batched_nms_mask(boxes, scores, jnp.asarray([1, 2]), 0.5))
    np.testing.assert_array_equal(same, [True, False])
    np.testing.assert_array_equal(diff, [True, True])


def test_nms_invalid_entries_never_kept():
    boxes = jnp.zeros((4, 4), jnp.float32)
    scores = jnp.asarray([0.5, 0.6, 0.7, 0.8], jnp.float32)
    valid = jnp.asarray([True, False, True, False])
    keep = np.asarray(B.nms_mask(boxes, scores, 0.5, valid))
    assert not keep[1] and not keep[3]


def test_roi_align_constant_field():
    # constant feature map -> every pooled bin equals the constant
    feat = jnp.full((16, 16, 3), 7.0, jnp.float32)
    rois = jnp.asarray([[2.0, 2.0, 10.0, 10.0]], jnp.float32)
    out = roi_align(feat, rois, spatial_scale=1.0, output_size=7)
    np.testing.assert_allclose(np.asarray(out), 7.0, rtol=1e-6)


def test_roi_align_linear_field_exact():
    # bilinear sampling of a linear ramp is exact
    ys = jnp.arange(16, dtype=jnp.float32)
    feat = jnp.broadcast_to(ys[:, None, None], (16, 16, 1))
    rois = jnp.asarray([[0.0, 4.0, 8.0, 12.0]], jnp.float32)
    out = np.asarray(roi_align(feat, rois, 1.0, output_size=4, sampling_ratio=2))
    # bin centers along y: 4 + (i + .5) * 2 -> 5, 7, 9, 11
    np.testing.assert_allclose(out[0, :, 0, 0], [5, 7, 9, 11], rtol=1e-5)


def test_fpn_level_mapper():
    rois = jnp.asarray(
        [[0, 0, 64, 64], [0, 0, 448, 448]], jnp.float32
    )
    lvls = np.asarray(fpn_level_for_rois(rois, 4, 5))
    assert lvls[0] == 0  # small box -> first level
    assert lvls[1] == 1  # large box -> second level


def test_matcher_thresholds():
    from edtr_tpu.models.faster_rcnn import match_boxes, BELOW_LOW, BETWEEN

    iou = jnp.asarray([[0.8, 0.5, 0.1]], jnp.float32)  # 1 gt x 3 anchors
    gt_valid = jnp.asarray([True])
    m = np.asarray(match_boxes(iou, 0.7, 0.3, False, gt_valid))
    np.testing.assert_array_equal(m, [0, BETWEEN, BELOW_LOW])

    # allow_low_quality forces the best anchor per gt even below threshold
    iou2 = jnp.asarray([[0.2, 0.1, 0.05]], jnp.float32)
    m2 = np.asarray(match_boxes(iou2, 0.7, 0.3, True, gt_valid))
    assert m2[0] == 0 and m2[1] == BELOW_LOW


def test_balanced_sampler_counts():
    from edtr_tpu.models.faster_rcnn import balanced_sample

    pos = jnp.asarray([True] * 10 + [False] * 90)
    neg = jnp.asarray([False] * 10 + [True] * 90)
    sp, sn = balanced_sample(jax.random.PRNGKey(0), pos, neg, 64, 0.5)
    n_pos, n_neg = int(sp.sum()), int(sn.sum())
    assert n_pos == 10  # only 10 positives available (cap 32)
    assert n_neg == 64 - n_pos
    assert not bool((sp & ~pos).any()) and not bool((sn & ~neg).any())


def test_chunked_nms_equals_naive_greedy():
    """Chunked NMS must reproduce exact sequential greedy semantics."""
    g = np.random.default_rng(7)
    n = 300
    centers = g.random((n, 2)) * 80
    wh = g.random((n, 2)) * 30 + 5
    boxes = np.concatenate([centers, centers + wh], axis=1).astype(np.float32)
    scores = g.random(n).astype(np.float32)
    valid = g.random(n) > 0.1

    def np_iou(a, b):
        area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
        area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        lt = np.maximum(a[:, None, :2], b[None, :, :2])
        rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[..., 0] * wh[..., 1]
        return inter / np.maximum(area_a[:, None] + area_b[None] - inter, 1e-9)

    def naive(boxes, scores, valid, t):
        order = np.argsort(-np.where(valid, scores, -np.inf))
        keep = np.zeros(n, bool)
        kept = []
        for i in order:
            if not valid[i]:
                continue
            iou = np_iou(boxes[i][None], boxes[kept])[0] if kept else np.zeros(0)
            if not (iou > t).any():
                keep[i] = True
                kept.append(i)
        return keep

    for t in (0.3, 0.5, 0.7):
        ours = np.asarray(B.nms_mask(jnp.asarray(boxes), jnp.asarray(scores), t,
                                     jnp.asarray(valid), chunk=64))
        ref = naive(boxes, scores, valid, t)
        np.testing.assert_array_equal(ours, ref, err_msg=f"t={t}")


def test_packed_nms_equals_dense_at_box_head_scale():
    """The bit-packed suppression path (N > NMS_CHUNK) must be bit-exact
    against the dense fixpoint at the real box-head scale (N=1000, padded
    internally to 1024), including under a class-style vmap.

    VERDICT r4 next #6: this path is what lets bs16 serving run under plain
    vmap with N²/32 bits resident instead of (N, N) fp32 matrices.
    """
    g = np.random.default_rng(9)
    n = 1000  # not a multiple of the 128-column block: exercises padding
    centers = g.random((4, n, 2)) * 400
    wh = g.random((4, n, 2)) * 80 + 4
    boxes = np.concatenate([centers, centers + wh], axis=2).astype(np.float32)
    scores = g.random((4, n)).astype(np.float32)
    valid = g.random((4, n)) > 0.05

    def dense(b, s, v, t):
        order = jnp.argsort(-jnp.where(v, s, -jnp.inf))
        sb, sv = b[order], v[order]
        iou = B.box_iou(sb, sb)
        earlier = jnp.arange(n)[None, :] < jnp.arange(n)[:, None]
        sup = (iou > t) & earlier & sv[None, :]
        keep = B._fixpoint_keep(
            sv, lambda k: jnp.any(sup & k[None, :], axis=1), n)
        return jnp.zeros((n,), bool).at[order].set(keep)

    for t in (0.5, 0.7):
        want = jax.vmap(lambda b, s, v: dense(b, s, v, t))(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
        got = jax.vmap(lambda b, s, v: B.nms_mask(b, s, t, v))(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want),
                                      err_msg=f"t={t}")


def test_pack_bits_roundtrip():
    g = np.random.default_rng(1)
    bits = g.random((3, 128)) > 0.5
    words = np.asarray(B._pack_bits(jnp.asarray(bits)))
    assert words.shape == (3, 4) and words.dtype == np.uint32
    unpacked = (words[..., :, None] >> np.arange(32, dtype=np.uint32)) & 1
    np.testing.assert_array_equal(unpacked.reshape(3, 128).astype(bool), bits)
