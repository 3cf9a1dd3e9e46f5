"""Evaluator + metric tests: COCO mAP protocol, mIoU, top-k, PSNR, tiling."""

import jax
import jax.numpy as jnp
import numpy as np

from edtr_tpu.utils.coco_eval import CocoEvaluator
from edtr_tpu.utils.metrics import compute_iou, confusion_matrix, topk_accuracy
from edtr_tpu.utils.image import calculate_psnr, wavelet_reconstruction


def _gt():
    return {
        "img1": dict(
            boxes=np.array([[10, 10, 50, 50], [60, 60, 100, 100]], float),
            labels=np.array([1, 2]),
            iscrowd=np.array([0, 0]),
            area=np.array([1600.0, 1600.0]),
        ),
        "img2": dict(
            boxes=np.array([[0, 0, 40, 40]], float),
            labels=np.array([1]),
            iscrowd=np.array([0]),
            area=np.array([1600.0]),
        ),
    }


def test_coco_eval_perfect_predictions():
    ev = CocoEvaluator(_gt())
    ev.update({
        "img1": dict(
            boxes=np.array([[10, 10, 50, 50], [60, 60, 100, 100]], float),
            scores=np.array([0.9, 0.8]),
            labels=np.array([1, 2]),
        ),
        "img2": dict(
            boxes=np.array([[0, 0, 40, 40]], float),
            scores=np.array([0.95]),
            labels=np.array([1]),
        ),
    })
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats["AP"] > 0.99 and stats["AP50"] > 0.99


def test_coco_eval_false_positive_lowers_ap():
    ev = CocoEvaluator(_gt())
    ev.update({
        "img1": dict(
            boxes=np.array([[10, 10, 50, 50], [200, 200, 240, 240]], float),
            scores=np.array([0.9, 0.95]),  # confident FP ranks first
            labels=np.array([1, 1]),
        ),
        "img2": dict(boxes=np.zeros((0, 4)), scores=np.zeros(0), labels=np.zeros(0, int)),
    })
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert 0.0 < stats["AP50"] < 0.9


def test_coco_eval_localization_threshold():
    # box with IoU ~0.58: counts at 0.5 but not 0.75
    ev = CocoEvaluator({
        "img": dict(boxes=np.array([[0, 0, 100, 100]], float), labels=np.array([1]),
                    iscrowd=np.array([0]), area=np.array([10000.0]))
    })
    ev.update({
        "img": dict(boxes=np.array([[0, 0, 100, 73]], float),
                    scores=np.array([0.9]), labels=np.array([1]))
    })
    ev.accumulate()
    stats = ev.summarize(verbose=False)
    assert stats["AP50"] > 0.99
    assert stats["AP75"] < 0.01


def test_miou():
    pred = np.array([[0, 1], [1, 1]])
    tgt = np.array([[0, 1], [255, 0]])  # one ignored, one wrong
    mat = confusion_matrix(pred, tgt, num_classes=2, ignore_index=255)
    assert mat.sum() == 3
    iou, miou = compute_iou(mat)
    np.testing.assert_allclose(iou[0], 0.5)  # 1 inter / (2 union)
    np.testing.assert_allclose(iou[1], 0.5)


def test_topk_accuracy():
    logits = jnp.asarray([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]], jnp.float32)
    labels = jnp.asarray([1, 2], jnp.int32)
    top1, top2, top3 = topk_accuracy(logits, labels, (1, 2, 3))
    assert int(top1) == 1 and int(top3) == 2


def test_psnr_identity_and_known():
    a = jnp.full((1, 8, 8, 3), 0.5, jnp.float32)
    b = a + 0.1
    psnr = float(calculate_psnr(a, b)[0])
    np.testing.assert_allclose(psnr, 20.0, atol=0.01)  # 10*log10(1/0.01)


def test_wavelet_reconstruction_identity():
    g = np.random.default_rng(0)
    x = jnp.asarray(g.random((1, 32, 32, 3)), jnp.float32)
    # same content/style -> exact reconstruction of x
    rec = wavelet_reconstruction(x, x)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-5)


def test_tiled_fn_matches_direct_on_linear_op():
    from edtr_tpu.utils.tiling import make_tiled_fn

    g = np.random.default_rng(1)
    x = jnp.asarray(g.random((1, 16, 16, 3)), jnp.float32)
    fn = lambda t: t * 2.0 + 1.0
    tiled = make_tiled_fn(fn, size=8, stride=4)
    np.testing.assert_allclose(np.asarray(tiled(x)), np.asarray(fn(x)), rtol=1e-5, atol=1e-5)


def test_harness_padding():
    from edtr_tpu.train.harness import list_to_batch, pad_annots

    imgs = [np.ones((10, 8, 3), np.float32), np.ones((12, 12, 3), np.float32)]
    batch = list_to_batch(imgs, img_size=16)
    assert batch.shape == (2, 16, 16, 3)
    assert batch[0, :10, :8].min() == 1.0 and batch[0, 10:, :].max() == 0.0

    annots = [dict(boxes=[[1, 2, 3, 4]], labels=[5])]
    padded = pad_annots(annots, max_gt=8)
    assert padded["boxes"].shape == (1, 8, 4)
    assert padded["valid"][0, 0] and not padded["valid"][0, 1]


def test_tiled_vae_gn_sync_close_to_untiled():
    """GN-synced tiled encode/decode vs untiled on a tiny VAE."""
    import __graft_entry__ as G
    from edtr_tpu.utils.tiling import tiled_vae_decode, tiled_vae_encode

    pipe = G._flagship_pipeline(dtype=None, tiny=True)
    params = G._init_params(pipe, jax.random.PRNGKey(0), 64)

    g = np.random.default_rng(0)
    img = jnp.asarray(g.random((1, 128, 128, 3)), jnp.float32) * 2 - 1

    ref_post = pipe.cldm.vae.apply(
        {"params": params["vae"]}, img, method=pipe.cldm.vae.encode
    )
    tiled_post = tiled_vae_encode(pipe.cldm, params, img, tile_size=64,
                                  gn_sync_iters=2)
    d = np.abs(np.asarray(tiled_post.mean) - np.asarray(ref_post.mean))
    scale = np.abs(np.asarray(ref_post.mean)).mean() + 1e-6
    assert d.mean() / scale < 0.3, (d.mean(), scale)

    z = ref_post.mode()
    ref_dec = np.asarray(pipe.cldm.vae.apply(
        {"params": params["vae"]}, z, method=pipe.cldm.vae.decode
    ))
    ref_scale = np.abs(ref_dec).mean() + 1e-6

    def decode_err(iters):
        out = tiled_vae_decode(pipe.cldm, params, z, tile_size=8,
                               gn_sync_iters=iters)
        return float(np.abs(np.asarray(out) - ref_dec).mean() / ref_scale)

    err_unsynced = decode_err(0)
    err_synced = decode_err(2)
    # global GroupNorm stats must bring tiled closer to untiled than
    # per-tile stats do (this is the point of the sync)
    assert err_synced <= err_unsynced + 1e-3, (err_synced, err_unsynced)
    assert err_synced < 0.8, err_synced  # random-init tiny VAE, extreme 2x2 tiling


def test_checkpoint_roundtrip(tmp_path):
    from edtr_tpu.utils import checkpoint as ckpt

    tree = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "step": jnp.asarray(7)}
    path = str(tmp_path / "state")
    ckpt.save_checkpoint(path, tree)
    restored = ckpt.restore_checkpoint(path, tree)
    np.testing.assert_array_equal(np.asarray(restored["a"]["w"]),
                                  np.asarray(tree["a"]["w"]))
    assert int(restored["step"]) == 7


def test_coco_index(tmp_path):
    import json

    from edtr_tpu.data.coco import COCOIndex, gt_from_coco_index

    ann = dict(
        images=[{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        annotations=[
            {"id": 10, "image_id": 1, "bbox": [5, 5, 20, 30], "category_id": 3,
             "area": 600, "iscrowd": 0},
        ],
        categories=[{"id": 3, "name": "cat"}],
    )
    p = tmp_path / "inst.json"
    p.write_text(json.dumps(ann))
    coco = COCOIndex(str(p))
    assert coco.getImgIds() == [1, 2]
    assert coco.getAnnIds(1) == [10] and coco.getAnnIds(2) == []
    gt = gt_from_coco_index(coco)
    np.testing.assert_allclose(gt[1]["boxes"], [[5, 5, 25, 35]])


def test_flops_estimate():
    from edtr_tpu.utils.profiling import flops_estimate

    cost = flops_estimate(lambda a, b: a @ b,
                          jnp.ones((128, 64)), jnp.ones((64, 32)))
    assert cost["flops"] >= 2 * 128 * 64 * 32 * 0.9


def test_nan_guard():
    import pytest as _pytest

    from edtr_tpu.utils.profiling import nan_guard

    nan_guard({"x": jnp.ones(3)})
    with _pytest.raises(FloatingPointError):
        nan_guard({"x": jnp.asarray([1.0, np.nan])})


def test_tiled_model_fn_slices_hint():
    """tiled_model_fn must hand each tile the matching c_img slice
    (utils/sampler.py:288-303 parity)."""
    from edtr_tpu.utils.tiling import tiled_model_fn

    g = np.random.default_rng(3)
    c_img = jnp.asarray(g.random((1, 16, 16, 4)), jnp.float32)

    # model that returns x + c_img: correct tiling reproduces the full map
    def model_fn(x, t, cond):
        return x + cond["c_img"]

    x = jnp.asarray(g.random((1, 16, 16, 4)), jnp.float32)
    cond = {"c_txt": jnp.zeros((1, 4, 8)), "c_img": c_img}
    tiled = tiled_model_fn(model_fn, tile_size=8, tile_stride=4)
    out = tiled(x, jnp.zeros((1,), jnp.int32), cond)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(x + c_img), rtol=1e-5, atol=1e-5
    )


def test_tiled_fn_auto_shrinks_oversized_tiles():
    """Tile size larger than the input must auto-shrink (reference VAEHook
    parity) instead of emitting negative window starts — the demo decoder
    hits this with small latents."""
    import jax.numpy as jnp

    from edtr_tpu.utils.tiling import make_tiled_fn

    x = jnp.arange(2 * 24 * 30 * 3, dtype=jnp.float32).reshape(2, 24, 30, 3)
    f = make_tiled_fn(lambda t, **kw: t * 2.0, size=256, stride=192)
    out = f(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2.0, rtol=1e-6)
