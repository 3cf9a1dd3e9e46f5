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
