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


def test_task_train_cls_debug(fake_imagefolder, tmp_path):
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
        ),
        train=dict(
            seed=231, exp_dir=str(tmp_path / "exp"), learning_rate=1e-2,
            batch_size=2, num_workers=0, train_steps=2,
        ),
    )
    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)

    state = task_train(cfg_path, task="cls", recipe="task", debug=True)
    assert int(state.step) == 2
    # checkpoints + archived config + logs landed in exp_dir
    assert os.path.isdir(os.path.join(str(tmp_path / "exp"), "checkpoints"))
    assert os.path.exists(os.path.join(str(tmp_path / "exp"), "cfg.yaml"))


@pytest.fixture(scope="module")
def fake_coco(tmp_path_factory):
    """Synthetic COCO tree: train2017/ images + instances json."""
    import json

    from PIL import Image

    root = tmp_path_factory.mktemp("coco")
    (root / "train2017").mkdir()
    (root / "annotations").mkdir()
    g = np.random.default_rng(1)
    images, annots = [], []
    aid = 1
    for i in range(4):
        name = f"{i:012d}.jpg"
        arr = (g.random((96, 96, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(root / "train2017" / name)
        images.append(dict(id=i + 1, file_name=name, height=96, width=96))
        for _ in range(2):
            x, y = g.integers(0, 40, 2)
            w, h = g.integers(20, 40, 2)
            annots.append(dict(
                id=aid, image_id=i + 1, category_id=int(g.integers(1, 5)),
                bbox=[float(x), float(y), float(w), float(h)],
                area=float(w * h), iscrowd=0,
                segmentation=[[float(x), float(y), float(x + w), float(y),
                               float(x + w), float(y + h), float(x), float(y + h)]],
            ))
            aid += 1
    meta = dict(images=images, annotations=annots,
                categories=[dict(id=c, name=f"c{c}") for c in range(1, 6)])
    with open(root / "annotations" / "instances_train2017.json", "w") as f:
        json.dump(meta, f)
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
