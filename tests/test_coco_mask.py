"""COCO mask primitives: polygon rasterization + RLE codecs.

pycocotools is absent here, so parity is established three ways:
exact axis-aligned rectangle semantics (known COCO mask-API behavior),
a PIL even-odd-fill oracle for random polygons (boundary-tolerant), and
codec roundtrips incl. the compressed string's delta/sign-extension edge
cases.
"""

import numpy as np
import pytest

from edtr_tpu.data import coco_mask as M


def test_rle_roundtrip_random_masks():
    rng = np.random.default_rng(0)
    for _ in range(20):
        h, w = rng.integers(1, 40, 2)
        mask = (rng.random((h, w)) > 0.5).astype(np.uint8)
        rle = M.rle_encode_mask(mask)
        assert sum(rle["counts"]) == h * w
        np.testing.assert_array_equal(M.rle_decode(rle), mask)
        assert M.rle_area(rle) == mask.sum()


def test_rle_compress_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(50):
        n = int(rng.integers(1, 30))
        counts = rng.integers(0, 10_000, n).tolist()
        s = M.rle_compress(counts)
        assert isinstance(s, bytes)
        assert M.rle_decompress(s) == counts
    # delta coding can go negative (sign-extension path)
    counts = [5, 1, 3, 90000, 1, 2, 1]  # c[6]-c[4] < 0 ... c[3]-c[1] > 0
    assert M.rle_decompress(M.rle_compress(counts)) == counts


def test_compressed_counts_accepted_by_decode():
    mask = np.zeros((7, 9), np.uint8)
    mask[2:5, 3:8] = 1
    rle = M.rle_encode_mask(mask)
    packed = {"size": rle["size"], "counts": M.rle_compress(rle["counts"])}
    np.testing.assert_array_equal(M.rle_decode(packed), mask)
    assert M.rle_area(packed) == 15
    assert M.rle_to_bbox(packed) == [3.0, 2.0, 5.0, 3.0]


def test_polygon_integer_rectangle_exact():
    """COCO mask-API rasterization of an integer axis-aligned rectangle
    [x0,y0 .. x1,y1] fills exactly [y0:y1] x [x0:x1]."""
    h, w = 12, 15
    x0, y0, x1, y1 = 3, 2, 9, 8
    poly = [x0, y0, x1, y0, x1, y1, x0, y1]
    mask = M.rle_decode(M.poly_to_rle(poly, h, w))
    expect = np.zeros((h, w), np.uint8)
    expect[y0:y1, x0:x1] = 1
    np.testing.assert_array_equal(mask, expect)


def test_polygon_full_image():
    h, w = 10, 11
    mask = M.rle_decode(M.poly_to_rle([0, 0, w, 0, w, h, 0, h], h, w))
    assert mask.all()


def test_polygon_vs_pil_oracle_band():
    """Random star polygons vs PIL's even-odd fill: interiors must agree;
    disagreement only within a 1-px band around the boundary."""
    from PIL import Image, ImageDraw

    rng = np.random.default_rng(3)
    h = w = 48
    for trial in range(10):
        n = int(rng.integers(3, 8))
        ang = np.sort(rng.random(n) * 2 * np.pi)
        r = 8 + rng.random(n) * 12
        cx, cy = (24 + rng.random(2) * 6 - 3).tolist()
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)
        poly = np.stack([xs, ys], 1).reshape(-1).tolist()

        ours = M.rle_decode(M.poly_to_rle(poly, h, w)).astype(bool)

        img = Image.new("1", (w, h))
        ImageDraw.Draw(img).polygon(
            [(x, y) for x, y in zip(xs, ys)], fill=1, outline=1
        )
        ref = np.asarray(img, dtype=bool)

        # 3x3 dilation of the disagreement tolerance band (pure numpy)
        pad = np.pad(ref, 1)
        band = np.zeros_like(ref)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                band |= pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        band &= ~_erode(ref)
        diff = ours ^ ref
        assert not (diff & ~band).any(), f"trial {trial}: interior mismatch"
        # pixel count tracks the shoelace area to within a perimeter's worth
        # of boundary pixels (PIL over-fills its outline; COCO is leaner)
        area = 0.5 * abs(
            np.dot(xs, np.roll(ys, -1)) - np.dot(ys, np.roll(xs, -1))
        )
        perim = np.hypot(np.diff(np.append(xs, xs[0])),
                         np.diff(np.append(ys, ys[0]))).sum()
        assert abs(ours.sum() - area) <= perim + 4, (
            f"trial {trial}: {ours.sum()} px vs shoelace {area:.1f}"
        )


def _erode(m: np.ndarray) -> np.ndarray:
    h, w = m.shape
    pad = np.pad(m, 1, constant_values=True)
    out = np.ones_like(m)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            out &= pad[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
    return out


def test_multi_polygon_union_and_rle_segm():
    h = w = 20
    a = [1, 1, 6, 1, 6, 6, 1, 6]
    b = [10, 10, 16, 10, 16, 16, 10, 16]
    masks = M.convert_coco_poly_to_mask([[a, b]], h, w)
    assert masks.shape == (1, h, w)
    assert masks[0, 2, 2] == 1 and masks[0, 12, 12] == 1 and masks[0, 8, 8] == 0

    # crowd-style RLE segmentation passes through decode
    rle = M.rle_encode_mask(masks[0])
    np.testing.assert_array_equal(M.segmentation_to_mask(rle, h, w), masks[0])

    assert M.convert_coco_poly_to_mask([], h, w).shape == (0, h, w)


def test_convert_coco_annotations():
    from edtr_tpu.data.coco import convert_coco_annotations

    h, w = 30, 40
    anno = [
        {"bbox": [5, 5, 10, 8], "category_id": 2, "area": 80.0, "iscrowd": 0,
         "segmentation": [[5, 5, 15, 5, 15, 13, 5, 13]]},
        {"bbox": [-3, -2, 10, 10], "category_id": 1, "area": 100.0, "iscrowd": 0,
         "segmentation": [[0, 0, 7, 0, 7, 8, 0, 8]]},
        {"bbox": [1, 1, 5, 5], "category_id": 3, "area": 25.0, "iscrowd": 1,
         "segmentation": {"size": [h, w], "counts": [h * w]}},  # crowd: dropped
        {"bbox": [20, 20, 0, 5], "category_id": 4, "area": 0.0, "iscrowd": 0,
         "segmentation": [[20, 20, 20, 25]]},  # degenerate: filtered by keep
    ]
    t = convert_coco_annotations(anno, h, w)
    assert t["boxes"].shape == (2, 4)
    np.testing.assert_allclose(t["boxes"][0], [5, 5, 15, 13])
    np.testing.assert_allclose(t["boxes"][1], [0, 0, 7, 8])  # clamped
    assert t["labels"].tolist() == [2, 1]
    assert t["masks"].shape == (2, h, w)
    assert t["masks"][0, 8, 8] == 1 and t["masks"][0, 20, 20] == 0
