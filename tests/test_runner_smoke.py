"""Runner smoke tests: config-driven task training over a synthetic dataset."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def fake_imagefolder(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("cub")
    g = np.random.default_rng(0)
    for cls in ("001.bird", "002.other"):
        d = root / "train" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = (g.random((80, 96, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(root)


@pytest.fixture(scope="module")
def fake_paired_cls(tmp_path_factory):
    """Paired gt/lq val tree for PairedClassificationDataset."""
    from PIL import Image

    root = tmp_path_factory.mktemp("cub_val")
    g = np.random.default_rng(5)
    for sub in ("gt", "lq"):
        for cls in ("001.bird", "002.other"):
            d = root / sub / cls
            d.mkdir(parents=True)
            for i in range(2):
                arr = (g.random((64, 64, 3)) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{i}.png")
    return str(root)


def test_task_train_cls_debug(fake_imagefolder, fake_paired_cls, tmp_path):
    """Oracle/LQ cls training with in-training val + image dumps (--debug
    short-circuits the % every conditions, reference
    main/cls/train_cls.py:253-style blocks)."""
    from edtr_tpu.train.runner import task_train

    cfg = dict(
        model=dict(clsnet=dict(
            target="model.resnet.ResNet", params=dict(type=18, num_classes=2))),
        dataset=dict(
            use_gt=False,
            train=dict(
                target="datasets.classification.DegradedClassificationDataset",
                params=dict(
                    root=os.path.join(fake_imagefolder, "train"),
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"),
                    gt_size=64, out_size=64, crop_type="center",
                    hflip=True, rotation=False,
                    blur_kernel_size=41, kernel_list=["iso", "aniso"],
                    kernel_prob=[0.5, 0.5], blur_sigma=[0.1, 8],
                    downsample_range=[1, 4], noise_range=[0, 10],
                    jpeg_range=[60, 100],
                ),
            ),
            val=dict(
                target="datasets.classification.PairedClassificationDataset",
                params=dict(
                    root=fake_paired_cls,
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"),
                ),
            ),
        ),
        train=dict(
            seed=231, exp_dir=str(tmp_path / "exp"), learning_rate=1e-2,
            batch_size=2, num_workers=0, train_steps=2, image_every=1000,
        ),
        val=dict(batch_size=2, num_workers=0, val_every=1000),
    )
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    state = task_train(cfg_path, task="cls", recipe="task", debug=True)
    assert int(state.step) == 2
    # checkpoints + archived config + logs landed in exp_dir
    exp = str(tmp_path / "exp")
    assert os.path.isdir(os.path.join(exp, "checkpoints"))
    assert os.path.exists(os.path.join(exp, "cfg.yaml"))
    # debug short-circuits val_every/image_every: val metric logged + grid saved
    import glob as g

    grids = g.glob(os.path.join(exp, "images", "*.png"))
    assert grids, "image grid not dumped"
    logs = g.glob(os.path.join(exp, "*.log"))
    log_txt = "".join(open(p).read() for p in logs) if logs else ""
    assert "top1" in log_txt or "val @" in log_txt, "no val metric logged"


@pytest.fixture(scope="module")
def fake_coco(tmp_path_factory):
    """Synthetic COCO tree: train2017/ + val2017/ images, instances jsons,
    and a paired val2017-deg/{gt,lq} tree for PairedDetectionDatasetCoco."""
    import json

    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    g = np.random.default_rng(1)
    for split, n_img in (("train", 4), ("val", 2)):
        (root / f"{split}2017").mkdir()
        (root / "annotations").mkdir(exist_ok=True)
        images, annots = [], []
        aid = 1
        for i in range(n_img):
            name = f"{i:012d}.jpg"
            arr = (g.random((96, 96, 3)) * 255).astype(np.uint8)
            Image.fromarray(arr).save(root / f"{split}2017" / name)
            images.append(dict(id=i + 1, file_name=name, height=96, width=96))
            for _ in range(2):
                x, y = g.integers(0, 40, 2)
                w, h = g.integers(20, 40, 2)
                annots.append(dict(
                    id=aid, image_id=i + 1, category_id=int(g.integers(1, 5)),
                    bbox=[float(x), float(y), float(w), float(h)],
                    area=float(w * h), iscrowd=0,
                    segmentation=[[float(x), float(y), float(x + w), float(y),
                                   float(x + w), float(y + h), float(x),
                                   float(y + h)]],
                ))
                aid += 1
        meta = dict(images=images, annotations=annots,
                    categories=[dict(id=c, name=f"c{c}") for c in range(1, 6)])
        with open(root / "annotations" / f"instances_{split}2017.json", "w") as f:
            json.dump(meta, f)
    # paired val tree (gt == lq == clean here; geometry only matters)
    for sub in ("gt", "lq"):
        (root / "val2017-deg" / sub).mkdir(parents=True)
        for i in range(2):
            src = root / "val2017" / f"{i:012d}.jpg"
            Image.open(src).save(root / "val2017-deg" / sub / f"{i:012d}.png")
    return str(root)


def test_cocov2_realesrgan_train_debug(fake_coco, tmp_path):
    """VERDICT r1 #3: the COCO v2 recipe trains end-to-end — clean images +
    per-item kernels from the dataset, RealESRGAN degradation applied
    through prepare_batch's batch_transform path (reference
    main/det/train_edtr.py:115-117,163)."""
    from edtr_tpu.train.runner import task_train

    kernels = dict(
        blur_kernel_size=21,
        kernel_list=["iso", "aniso", "generalized_iso", "generalized_aniso",
                     "plateau_iso", "plateau_aniso"],
        kernel_prob=[0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
        sinc_prob=0.1, blur_sigma=[0.2, 3],
        betag_range=[0.5, 4], betap_range=[1, 2],
        blur_kernel_size2=21,
        kernel_list2=["iso", "aniso", "generalized_iso", "generalized_aniso",
                      "plateau_iso", "plateau_aniso"],
        kernel_prob2=[0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
        sinc_prob2=0.1, blur_sigma2=[0.2, 1.5],
        betag_range2=[0.5, 4], betap_range2=[1, 2],
        final_sinc_prob=0.8,
    )
    cfg = dict(
        model=dict(detnet=dict(
            target="model.faster_rcnn.fasterrcnn_mobilenet_v3_large_fpn",
            params=dict(num_classes=6, min_size=96, max_size=192,
                        rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=32,
                        rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=32,
                        rpn_batch_size_per_image=32,
                        box_batch_size_per_image=16,
                        box_detections_per_img=8))),
        dataset=dict(
            is_coco=True,
            train=dict(
                target="datasets.detection_cocov2.DegradedDetectionDatasetCocov2",
                params=dict(
                    root=fake_coco, image_set="train",
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"),
                    gt_size=96, out_size=96, hflip=True, rotation=False,
                    crop_type="none", **kernels),
            ),
            batch_transform=dict(
                target="datasets.detection_cocov2.RealESRGANBatchTransform",
                params=dict(hq_key="hq", extra_keys=[], use_sharpener=True,
                            queue_size=0, stage2_scale=4, resize_back=True),
            ),
        ),
        train=dict(
            seed=231, exp_dir=str(tmp_path / "exp_coco"), learning_rate=5e-3,
            batch_size=2, num_workers=0, train_steps=2,
        ),
    )
    cfg_path = str(tmp_path / "cfg_coco.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    state = task_train(cfg_path, task="det", recipe="task", debug=True)
    assert int(state.step) == 2


@pytest.mark.golden
def test_edtr_train_det_debug_with_val_and_images(fake_coco, tmp_path):
    """Flagship edtr_train in --debug on a tiny tower: two alternating-update
    steps + in-training COCO validation + gt/lq/pre/restored image grid
    (VERDICT r1 #5; reference main/det/train_edtr.py:252-362)."""
    from edtr_tpu.train.runner import edtr_train

    tiny_sd = dict(
        use_checkpoint=False, in_channels=4, out_channels=4, model_channels=32,
        attention_resolutions=[1], num_res_blocks=1, channel_mult=[1, 2],
        num_head_channels=16, transformer_depth=1, context_dim=64,
        use_linear_in_transformer=True)
    tiny_cn = {k: v for k, v in tiny_sd.items() if k != "out_channels"}
    tiny_cn["hint_channels"] = 4
    cfg = dict(
        model=dict(
            pre_restoration=True,
            swinir=dict(target="model.swinir.SwinIR", params=dict(
                embed_dim=32, depths=[2], num_heads=[2], window_size=4,
                mlp_ratio=2, sf=8, upsampler="nearest+conv", unshuffle=True,
                unshuffle_scale=8)),
            cldm=dict(target="model.cldm.ControlLDM", params=dict(
                latent_scale_factor=0.18215, unet_cfg=tiny_sd,
                controlnet_cfg=tiny_cn,
                vae_cfg=dict(embed_dim=4, train_decoder=True, ddconfig=dict(
                    double_z=True, z_channels=4, in_channels=3, out_ch=3,
                    ch=32, ch_mult=[1, 2, 2, 2], num_res_blocks=1)),
                clip_cfg=dict(layer="penultimate", text_cfg=dict(
                    context_length=77, vocab_size=512, width=64, heads=4,
                    layers=2)))),
            teacher_detnet=dict(
                target="model.faster_rcnn.fasterrcnn_mobilenet_v3_large_fpn",
                params=dict(num_classes=6, min_size=96, max_size=192,
                            rpn_pre_nms_top_n_train=64,
                            rpn_post_nms_top_n_train=32,
                            rpn_pre_nms_top_n_test=64,
                            rpn_post_nms_top_n_test=32,
                            rpn_batch_size_per_image=32,
                            box_batch_size_per_image=16,
                            box_detections_per_img=8)),
            detnet=dict(
                target="model.faster_rcnn.fasterrcnn_mobilenet_v3_large_fpn",
                params=dict(num_classes=6, min_size=96, max_size=192,
                            rpn_pre_nms_top_n_train=64,
                            rpn_post_nms_top_n_train=32,
                            rpn_pre_nms_top_n_test=64,
                            rpn_post_nms_top_n_test=32,
                            rpn_batch_size_per_image=32,
                            box_batch_size_per_image=16,
                            box_detections_per_img=8)),
            diffusion=dict(target="model.gaussian_diffusion.Diffusion",
                           params=dict(linear_start=0.00085, linear_end=0.012,
                                       timesteps=1000)),
        ),
        dataset=dict(
            is_coco=True,
            train=dict(
                target="datasets.detection_coco.DegradedDetectionDatasetCoco",
                params=dict(
                    root=fake_coco, image_set="train",
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"),
                    gt_size=96, out_size=96, hflip=True, rotation=False,
                    crop_type="none", blur_kernel_size=21,
                    kernel_list=["iso", "aniso"], kernel_prob=[0.5, 0.5],
                    blur_sigma=[0.1, 4], downsample_range=[1, 4],
                    noise_range=[0, 10], jpeg_range=[60, 100])),
            val=dict(
                target="datasets.detection_coco.PairedDetectionDatasetCoco",
                params=dict(
                    root=fake_coco, path="val2017-deg", gt_size=96,
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"))),
        ),
        train=dict(
            seed=231, exp_dir=str(tmp_path / "exp_edtr"),
            learning_rate_edtr=1e-4, learning_rate_detnet=5e-3,
            start_timestep=200, num_timesteps=4, default_prompt="",
            weight_hlf=0.5, weight_det=1.0, weight_fm=0.2,
            batch_size=2, num_workers=0, train_steps=2, image_every=500),
        val=dict(batch_size=1, num_workers=0, val_every=2000,
                 start_timestep=200, num_timesteps=4, default_prompt=""),
    )
    cfg_path = str(tmp_path / "cfg_edtr.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    state = edtr_train(cfg_path, debug=True)
    assert int(state.step) == 2
    import glob as g

    exp = str(tmp_path / "exp_edtr")
    assert g.glob(os.path.join(exp, "images", "*.png")), "no image grid"
    logs = g.glob(os.path.join(exp, "*.log"))
    log_txt = "".join(open(p).read() for p in logs) if logs else ""
    assert "AP" in log_txt or "val @" in log_txt, "no val mAP logged"


@pytest.fixture(scope="module")
def fake_voc_seg(tmp_path_factory):
    """Synthetic VOC segmentation tree (JPEGImages + SegmentationClass)."""
    from PIL import Image

    root = tmp_path_factory.mktemp("voc")
    base = root / "VOC2012"
    (base / "JPEGImages").mkdir(parents=True)
    (base / "SegmentationClass").mkdir()
    (base / "ImageSets" / "Segmentation").mkdir(parents=True)
    g = np.random.default_rng(9)
    names = [f"2012_{i:06d}" for i in range(4)]
    for n in names:
        arr = (g.random((96, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(base / "JPEGImages" / f"{n}.jpg")
        mask = g.integers(0, 21, (96, 96)).astype(np.uint8)
        Image.fromarray(mask, mode="L").save(base / "SegmentationClass" / f"{n}.png")
    with open(base / "ImageSets" / "Segmentation" / "train.txt", "w") as f:
        f.write("\n".join(names) + "\n")
    return str(root)


def test_task_train_seg_oracle_debug(fake_voc_seg, tmp_path):
    """Seg oracle recipe (main/seg/train_seg.py parity) over a synthetic VOC
    tree — exercises the seg loss, SGD wd=1e-6 branch, and the val hooks."""
    from edtr_tpu.train.runner import task_train

    cfg = dict(
        model=dict(segnet=dict(
            target="model.deeplabv3.deeplabv3_mobilenet_v3_large",
            params=dict(num_classes=21, aux_loss=False))),
        dataset=dict(
            use_gt=True,
            train=dict(
                target="datasets.segmentation.DegradedSegmentationDataset",
                params=dict(
                    root=fake_voc_seg, year="2012", image_set="train",
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"),
                    gt_size=96, resize_range=[0.8, 1.2], out_size=64,
                    crop_type="random", hflip=True, rotation=False,
                    blur_kernel_size=21, kernel_list=["iso", "aniso"],
                    kernel_prob=[0.5, 0.5], blur_sigma=[0.1, 4],
                    downsample_range=[1, 4], noise_range=[0, 10],
                    jpeg_range=[60, 100]),
            ),
        ),
        train=dict(
            seed=123, exp_dir=str(tmp_path / "exp_seg"), learning_rate=2e-2,
            batch_size=2, num_workers=0, train_steps=2,
        ),
    )
    cfg_path = str(tmp_path / "cfg_seg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    state = task_train(cfg_path, task="seg", recipe="task", debug=True)
    assert int(state.step) == 2


def test_sr4ir_train_cls_debug(fake_imagefolder, tmp_path):
    """SR4IR joint recipe (main/cls/train_swinir-sr4ir.py parity): swinir
    AdamW wd=0 half + task SGD half + CutMix-quality mix."""
    from edtr_tpu.train.runner import task_train

    cfg = dict(
        model=dict(
            swinir=dict(target="model.swinir.SwinIR", params=dict(
                embed_dim=16, depths=[2], num_heads=[2], window_size=4,
                mlp_ratio=2, sf=8, upsampler="nearest+conv", unshuffle=True,
                unshuffle_scale=8)),
            clsnet=dict(target="model.resnet.ResNet",
                        params=dict(type=18, num_classes=2)),
        ),
        dataset=dict(
            train=dict(
                target="datasets.classification.DegradedClassificationDataset",
                params=dict(
                    root=os.path.join(fake_imagefolder, "train"),
                    file_backend_cfg=dict(
                        target="datasets.file_backend.HardDiskBackend"),
                    gt_size=64, out_size=64, crop_type="center",
                    hflip=True, rotation=False,
                    blur_kernel_size=21, kernel_list=["iso", "aniso"],
                    kernel_prob=[0.5, 0.5], blur_sigma=[0.1, 4],
                    downsample_range=[1, 4], noise_range=[0, 10],
                    jpeg_range=[60, 100]),
            ),
        ),
        train=dict(
            seed=123, exp_dir=str(tmp_path / "exp_sr4ir"), pix_weight=1.0,
            learning_rate_swinir=1e-4, learning_rate_task=5e-3,
            learning_rate=5e-3, batch_size=2, num_workers=0, train_steps=2,
        ),
    )
    cfg_path = str(tmp_path / "cfg_sr4ir.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    state = task_train(cfg_path, task="cls", recipe="sr4ir", debug=True)
    sw_state, t_state = state
    assert int(sw_state.step) == 2 and int(t_state.step) == 2
