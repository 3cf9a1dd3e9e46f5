#!/usr/bin/env python
"""Generate the full 50-config matrix (SURVEY.md §5.6; VERDICT r1 #2).

Emits every recipe the reference ships — cls/seg/det x train/test x
{oracle, lq, swinir-pre, swinir, sr4ir, diffbir, edtr-s1, edtr-s4} + the COCO
real-world family + demo — in the reference's YAML schema (`target:`/`params:`
nodes with reference dotted paths, resolved by ``edtr_tpu.config.REGISTRY``).
Hyperparameters are the published recipe values
(/root/reference/configs/**.yaml; BASELINE.md / SURVEY.md §6).

Run from the repo root:  python tools/gen_configs.py
"""

import copy
import os

import yaml

OUT = os.path.join(os.path.dirname(__file__), "..", "configs")

# ---------------------------------------------------------------------------
# shared towers
# ---------------------------------------------------------------------------

SWINIR = {
    "target": "model.swinir.SwinIR",
    "params": {
        "img_size": 64, "patch_size": 1, "in_chans": 3, "embed_dim": 180,
        "depths": [6] * 8, "num_heads": [6] * 8, "window_size": 8,
        "mlp_ratio": 2, "sf": 8, "img_range": 1.0,
        "upsampler": "nearest+conv", "resi_connection": "1conv",
        "unshuffle": True, "unshuffle_scale": 8,
    },
}

DIFFUSION = {
    "target": "model.gaussian_diffusion.Diffusion",
    "params": {"linear_start": 0.00085, "linear_end": 0.0120, "timesteps": 1000},
}

NSAMPLER = {  # dead node kept for config fidelity (cls test edtr configs)
    "target": "model.vae.Encoder",
    "params": {
        "double_z": False, "z_channels": 4, "resolution": 256,
        "in_channels": 3, "out_ch": 3, "ch": 32, "ch_mult": [1, 2, 4, 8],
        "num_res_blocks": 1, "attn_resolutions": [], "dropout": 0.0,
    },
}


def cldm(train_decoder: bool):
    sd_block = {
        "use_checkpoint": True, "image_size": 32, "in_channels": 4,
        "model_channels": 320, "attention_resolutions": [4, 2, 1],
        "num_res_blocks": 2, "channel_mult": [1, 2, 4, 4],
        "num_head_channels": 64, "use_spatial_transformer": True,
        "use_linear_in_transformer": True, "transformer_depth": 1,
        "context_dim": 1024, "legacy": False,
    }
    unet = dict(sd_block, out_channels=4)
    cn = dict(sd_block, hint_channels=4)
    return {
        "target": "model.cldm.ControlLDM",
        "params": {
            "latent_scale_factor": 0.18215,
            "unet_cfg": unet,
            "vae_cfg": {
                "train_decoder": train_decoder, "embed_dim": 4,
                "ddconfig": {
                    "double_z": True, "z_channels": 4, "resolution": 256,
                    "in_channels": 3, "out_ch": 3, "ch": 128,
                    "ch_mult": [1, 2, 4, 4], "num_res_blocks": 2,
                    "attn_resolutions": [], "dropout": 0.0,
                },
            },
            "clip_cfg": {
                "embed_dim": 1024,
                "vision_cfg": {"image_size": 224, "layers": 32, "width": 1280,
                               "head_width": 80, "patch_size": 14},
                "text_cfg": {"context_length": 77, "vocab_size": 49408,
                             "width": 1024, "heads": 16, "layers": 24},
                "layer": "penultimate",
            },
            "controlnet_cfg": cn,
        },
    }


# ---------------------------------------------------------------------------
# per-task facts
# ---------------------------------------------------------------------------

CODEFORMER_DEG = {
    "blur_kernel_size": 41, "kernel_list": ["iso", "aniso"],
    "kernel_prob": [0.5, 0.5], "blur_sigma": [0.1, 8],
    "downsample_range": [1, 16], "noise_range": [0, 10],
    "jpeg_range": [50, 100],
}

HDB = {"target": "datasets.file_backend.HardDiskBackend"}

TASKS = {
    "cls": dict(
        net_key="clsnet",
        net={"target": "model.resnet.ResNet",
             "params": {"type": 18, "num_classes": 200}},
        ds_name="cub200",
        train_ds={
            "target": "datasets.classification.DegradedClassificationDataset",
            "params": {"root": "datasets/source/CUB200/train",
                       "file_backend_cfg": HDB, "gt_size": 576,
                       "out_size": 512, "hflip": True, "rotation": False,
                       "crop_type": "random", **CODEFORMER_DEG},
        },
        val_ds={
            "target": "datasets.classification.PairedClassificationDataset",
            "params": {"root": "datasets/source/CUB200/val-deg",
                       "file_backend_cfg": HDB},
        },
        seed=123, batch=32, oracle_lr="1e-2", oracle_steps=20000,
        oracle_resume="ResNet18_Weights.IMAGENET1K_V1",
        pre_batch=48, pre_val_every=1000, val_batch=32, test_batch=32,
        edtr_seeds={"006": 123, "007": 321}, weight_fm=1.0, w_key="weight_ce",
        edtr_val_every={"006": 1000, "007": 2000}, edtr_image_every=500,
        diffbir_val_every=10000, nsampler_in_test=True,
    ),
    "seg": dict(
        net_key="segnet",
        net={"target": "model.deeplabv3.deeplabv3_mobilenet_v3_large",
             "params": {"weights_backbone": "MobileNet_V3_Large_Weights.IMAGENET1K_V1",
                        "num_classes": 21, "aux_loss": False}},
        ds_name="voc2012",
        train_ds={
            "target": "datasets.segmentation.DegradedSegmentationDataset",
            "params": {"root": "datasets/source/VOC", "year": "2012",
                       "image_set": "train", "file_backend_cfg": HDB,
                       "gt_size": 560, "resize_range": [0.5, 2.0],
                       "out_size": 512, "crop_type": "random", "hflip": True,
                       "rotation": False, **CODEFORMER_DEG},
        },
        val_ds={
            "target": "datasets.segmentation.PairedSegmentationDataset",
            "params": {"root": "datasets/source/VOC", "path": "JPEGImagesSeg-deg",
                       "year": "2012", "image_set": "val",
                       "file_backend_cfg": HDB},
        },
        seed=123, batch=16, oracle_lr="2e-2", oracle_steps=20000,
        oracle_resume=None,
        pre_batch=48, pre_val_every=1000, val_batch=-1, test_batch=1,
        edtr_seeds={"006": 123, "007": 123}, weight_fm=0.5, w_key="weight_ce",
        edtr_val_every={"006": 1000, "007": 1000}, edtr_image_every=500,
        diffbir_val_every=10000, nsampler_in_test=False,
    ),
    "det": dict(
        net_key="detnet",
        net={"target": "model.faster_rcnn.fasterrcnn_mobilenet_v3_large_fpn",
             "params": {"weights_backbone": "MobileNet_V3_Large_Weights.IMAGENET1K_V1",
                        "num_classes": 21}},
        ds_name="voc2012",
        train_ds={
            "target": "datasets.detection.DegradedDetectionDataset",
            "params": {"root": "datasets/source/VOC", "year": "2012",
                       "image_set": "train", "file_backend_cfg": HDB,
                       "gt_size": 512, "out_size": 512, "hflip": True,
                       "rotation": False, "crop_type": "none",
                       **CODEFORMER_DEG},
        },
        val_ds={
            "target": "datasets.detection.PairedDetectionDataset",
            "params": {"root": "datasets/source/VOC", "path": "JPEGImagesDet-deg",
                       "gt_size": 512, "year": "2012", "image_set": "val",
                       "file_backend_cfg": HDB},
        },
        seed=231, batch=16, oracle_lr="2e-2", oracle_steps=10000,
        oracle_resume=None,
        pre_batch=32, pre_val_every=1000, val_batch=-1, test_batch=1,
        edtr_seeds={"006": 231, "007": 231}, weight_fm=0.2, w_key="weight_det",
        edtr_val_every={"006": 2000, "007": 2000}, edtr_image_every=500,
        diffbir_val_every=6000, nsampler_in_test=False,
        ar_group=3,
    ),
}

NAMES = {
    "000": "oracle", "001": "lq", "002": "swinir-pre", "003": "swinir",
    "004": "swinir-sr4ir", "005": "diffbir", "006": "edtr-s1",
    "007": "edtr-s4",
}


def _exp(task, ds, num):
    return f"experiments/{task}/{ds}/{num}_{NAMES[num]}"


def _ckpt(task, ds, num, sub):
    return f"{_exp(task, ds, num)}/checkpoints/{sub}_last.pt"


def _common_train(t, task, num, lr_items, steps=10000, image_every=1000,
                  precision="fp16"):
    d = {"seed": t["seed"], "precision": precision,
         "exp_dir": _exp(task, t["ds_name"], num)}
    d.update(lr_items)
    if task == "det":
        d["aspect_ratio_group_factor"] = t.get("ar_group", 3)
    d.update({"batch_size": t["batch"], "num_workers": 16,
              "train_steps": steps, "log_every": 50, "ckpt_every": 10000,
              "image_every": image_every})
    return d


def build_task_configs(task):
    t = TASKS[task]
    ds = t["ds_name"]
    nk = t["net_key"]
    net = t["net"]
    out = {}

    def val_block(extra=None, every=None, batch=None):
        d = {"batch_size": t["val_batch"] if batch is None else batch,
             "num_workers": 16}
        if every is not None:
            d["val_every"] = every
        d.update(extra or {})
        return d

    # -- 000 oracle / 001 lq ------------------------------------------------
    for num, use_gt in (("000", True), ("001", False)):
        tr = _common_train(
            t, task, num, {}, steps=t["oracle_steps"], precision=None)
        tr["strict_load"] = False
        tr[f"resume_{nk}"] = t["oracle_resume"]
        tr["learning_rate"] = t["oracle_lr"]
        dset = {"train": copy.deepcopy(t["train_ds"]),
                "val": copy.deepcopy(t["val_ds"])}
        if use_gt:
            dset = {"use_gt": True, **dset}
        out[f"train/{num}_{NAMES[num]}.yaml"] = {
            "model": {nk: net},
            "dataset": dset,
            "train": _order_train(tr),
            "val": val_block(every=2000 if task == "det" else 1000),
        }

    # -- 002 swinir-pre -----------------------------------------------------
    tr = _common_train(t, task, "002", {"learning_rate": "1e-4"})
    tr["resume_swinir"] = "weights/codeformer_swinir.ckpt"
    tr["strict_load"] = True
    tr["batch_size"] = t["pre_batch"]
    out["train/002_swinir-pre.yaml"] = {
        "model": {"swinir": SWINIR},
        "dataset": {"train": copy.deepcopy(t["train_ds"]),
                    "val": copy.deepcopy(t["val_ds"])},
        "train": _order_train(tr),
        "val": val_block(every=t["pre_val_every"], batch=(
            t["pre_batch"] if task == "cls" else t["val_batch"])),
    }

    # -- 003 swinir (frozen) ------------------------------------------------
    tr = _common_train(t, task, "003", {"learning_rate": "5e-3"},
                       precision=None)
    tr["resume_swinir"] = _ckpt(task, ds, "002", "swinir")
    tr[f"resume_{nk}"] = _ckpt(task, ds, "000", nk)
    tr["strict_load"] = True
    out["train/003_swinir.yaml"] = {
        "model": {"swinir": SWINIR, nk: net},
        "dataset": {"train": copy.deepcopy(t["train_ds"]),
                    "val": copy.deepcopy(t["val_ds"])},
        "train": _order_train(tr),
        "val": val_block(every=2000 if task == "det" else 1000),
    }

    # -- 004 sr4ir ------------------------------------------------------------
    tr = _common_train(t, task, "004", {
        "pix_weight": 1.0, "learning_rate_swinir": "1e-4",
        f"learning_rate_{nk}": "5e-3"})
    tr["resume_swinir"] = _ckpt(task, ds, "002", "swinir")
    tr[f"resume_{nk}"] = _ckpt(task, ds, "000", nk)
    tr["strict_load"] = True
    out["train/004_swinir-sr4ir.yaml"] = {
        "model": {"swinir": SWINIR, nk: net},
        "dataset": {"train": copy.deepcopy(t["train_ds"]),
                    "val": copy.deepcopy(t["val_ds"])},
        "train": _order_train(tr),
        "val": val_block(every=2000 if task == "det" else 1000),
    }

    # -- 005 diffbir / 006 edtr-s1 / 007 edtr-s4 -----------------------------
    for num in ("005", "006", "007"):
        name = NAMES[num]
        is_edtr = num in ("006", "007")
        lr_key = "learning_rate_edtr" if is_edtr else "learning_rate_diffbir"
        tr = _common_train(
            t, task, num, {lr_key: "1e-4", f"learning_rate_{nk}": "5e-3"},
            image_every=t["edtr_image_every"])
        tr["seed"] = t["edtr_seeds"][num] if is_edtr else t["seed"]
        tr["sd_path"] = "weights/v2-1_512-ema-pruned.ckpt"
        tr["resume_cldm"] = None
        tr["resume_swinir"] = _ckpt(task, ds, "002", "swinir")
        tr[f"resume_teacher_{nk}"] = _ckpt(task, ds, "000", nk)
        tr[f"resume_{nk}"] = _ckpt(task, ds, "000", nk)
        tr["strict_load"] = True
        ts_extra = {}
        if is_edtr:
            ts_extra = {"start_timestep": 200,
                        "num_timesteps": 1 if num == "006" else 4}
            tr.update(ts_extra)
            tr["weight_hlf"] = 0.5
        elif task == "det":
            ts_extra = {"injected_noise_timesteps": 200}
            tr.update(ts_extra)
        tr["default_prompt"] = ""
        tr[t["w_key"]] = 1.0
        tr["weight_fm"] = t["weight_fm"]
        every = (t["edtr_val_every"][num] if is_edtr else t["diffbir_val_every"])
        # pre_restoration: edtr always; diffbir only in the det recipe
        pre_flag = is_edtr or (num == "005" and task == "det")
        out[f"train/{num}_{name}.yaml"] = {
            "model": {
                **({"pre_restoration": True} if pre_flag else {}),
                "swinir": SWINIR,
                "cldm": cldm(train_decoder=is_edtr),
                f"teacher_{nk}": net,
                nk: net,
                "diffusion": DIFFUSION,
            },
            "dataset": {"train": copy.deepcopy(t["train_ds"]),
                        "val": copy.deepcopy(t["val_ds"])},
            "train": _order_train(tr),
            "val": val_block(
                extra={**ts_extra, "default_prompt": ""}, every=every),
        }

    # ---- test configs -------------------------------------------------------
    def test_block(num, extra=None, resumes=None):
        # det 003/004 run without autocast in the reference; cls eval uses
        # bs 32 for the task-net-only configs and 8 once restoration enters
        precision = None if (task == "det" and num in ("003", "004")) else "fp16"
        batch = t["test_batch"]
        if task == "cls" and num not in ("000", "001"):
            batch = 8
        d = {"precision": precision, "exp_dir": _exp(task, ds, num)}
        d.update(resumes or {})
        d["strict_load"] = True
        d.update(extra or {})
        d.update({"batch_size": batch, "num_workers": 16})
        return d

    teacher_resume = {f"resume_teacher_{nk}": _ckpt(task, ds, "000", nk)}
    out["test/000_oracle.yaml"] = {
        "model": {nk: net},
        "dataset": {"use_gt": True, "val": copy.deepcopy(t["val_ds"])},
        "test": test_block("000", resumes={f"resume_{nk}": None}),
    }
    out["test/001_lq.yaml"] = {
        "model": {nk: net},
        "dataset": {"val": copy.deepcopy(t["val_ds"])},
        "test": test_block("001", resumes={
            **(teacher_resume if task == "cls" else {}),
            f"resume_{nk}": None}),
    }
    for num, with_sw_resume in (("003", True), ("004", False)):
        out[f"test/{num}_{NAMES[num]}.yaml"] = {
            "model": {
                **({"pre_restoration": True} if task == "cls" else {}),
                "swinir": SWINIR, nk: net},
            "dataset": {"val": copy.deepcopy(t["val_ds"])},
            "test": test_block(num, resumes={
                "resume_swinir": _ckpt(task, ds, "002", "swinir")
                if with_sw_resume else None,
                **(teacher_resume if task == "cls" else {}),
                f"resume_{nk}": None}),
        }
    # diffbir / edtr tests
    for num in ("005", "006", "007"):
        is_edtr = num in ("006", "007")
        extra = {"default_prompt": ""}
        if is_edtr:
            extra = {"start_timestep": 200,
                     "num_timesteps": 1 if num == "006" else 4,
                     "default_prompt": ""}
        # pre_restoration in test: edtr always; diffbir only det
        pre_flag = is_edtr or (num == "005" and task == "det")
        model = {
            **({"pre_restoration": True} if pre_flag else {}),
            "swinir": SWINIR,
            **({"nsampler": NSAMPLER}
               if (is_edtr and t["nsampler_in_test"]) else {}),
            "cldm": cldm(train_decoder=is_edtr),
            nk: net,
            "diffusion": DIFFUSION,
        }
        resumes = {"sd_path": "weights/v2-1_512-ema-pruned.ckpt",
                   "resume_decoder": None, "resume_cldm": None,
                   "resume_swinir": None, f"resume_{nk}": None}
        if is_edtr or task in ("cls", "seg"):
            resumes[f"resume_teacher_{nk}"] = _ckpt(task, ds, "000", nk)
        out[f"test/{num}_{NAMES[num]}.yaml"] = {
            "model": model,
            "dataset": {"val": copy.deepcopy(t["val_ds"])},
            "test": test_block(num, extra=extra, resumes=resumes),
        }
    return out


def _order_train(d):
    return d


def build_coco_configs():
    """The real-world COCO recipe family (assets/real-world-recipe.md)."""
    out = {}
    r50v2 = {"target": "model.faster_rcnn.fasterrcnn_resnet50_fpn_v2",
             "params": {"weights_backbone": "ResNet50_Weights.IMAGENET1K_V2",
                        "num_classes": 91}}
    coco_v1_train = {
        "target": "datasets.detection_coco.DegradedDetectionDatasetCoco",
        "params": {"root": "datasets/source/COCO", "image_set": "train",
                   "file_backend_cfg": HDB, "gt_size": 512, "out_size": 512,
                   "hflip": True, "rotation": False, "crop_type": "none",
                   "blur_kernel_size": 41, "kernel_list": ["iso", "aniso"],
                   "kernel_prob": [0.5, 0.5], "blur_sigma": [0.1, 8],
                   "downsample_range": [1, 12], "noise_range": [0, 10],
                   "jpeg_range": [50, 100]},
    }
    coco_v2_train = {
        "target": "datasets.detection_cocov2.DegradedDetectionDatasetCocov2",
        "params": {"root": "datasets/source/COCO", "image_set": "train",
                   "file_backend_cfg": HDB, "gt_size": 512, "out_size": 512,
                   "hflip": True, "rotation": False, "crop_type": "none",
                   "blur_kernel_size": 21,
                   "kernel_list": ["iso", "aniso", "generalized_iso",
                                   "generalized_aniso", "plateau_iso",
                                   "plateau_aniso"],
                   "kernel_prob": [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
                   "sinc_prob": 0.1, "blur_sigma": [0.2, 3],
                   "betag_range": [0.5, 4], "betap_range": [1, 2],
                   "blur_kernel_size2": 21,
                   "kernel_list2": ["iso", "aniso", "generalized_iso",
                                    "generalized_aniso", "plateau_iso",
                                    "plateau_aniso"],
                   "kernel_prob2": [0.45, 0.25, 0.12, 0.03, 0.12, 0.03],
                   "sinc_prob2": 0.1, "blur_sigma2": [0.2, 1.5],
                   "betag_range2": [0.5, 4], "betap_range2": [1, 2],
                   "final_sinc_prob": 0.8},
    }
    batch_transform = {
        "target": "datasets.detection_cocov2.RealESRGANBatchTransform",
        "params": {"hq_key": "hq", "extra_keys": [], "use_sharpener": True,
                   "queue_size": 0, "resize_prob": [0.2, 0.7, 0.1],
                   "resize_range": [0.15, 1.5], "gaussian_noise_prob": 0.5,
                   "noise_range": [1, 30], "poisson_scale_range": [0.05, 3],
                   "gray_noise_prob": 0.4, "jpeg_range": [30, 95],
                   "stage2_scale": 4, "second_blur_prob": 0.8,
                   "resize_prob2": [0.3, 0.4, 0.3], "resize_range2": [0.3, 1.2],
                   "gaussian_noise_prob2": 0.5, "noise_range2": [1, 25],
                   "poisson_scale_range2": [0.05, 2.5], "gray_noise_prob2": 0.4,
                   "jpeg_range2": [30, 95], "resize_back": True},
    }

    def coco_val(path):
        return {"target": "datasets.detection_coco.PairedDetectionDatasetCoco",
                "params": {"root": "datasets/source/COCO", "path": path,
                           "gt_size": 512, "file_backend_cfg": HDB}}

    # 000 swinir-pre (codeformer degradation)
    out["det/coco/train/000_swinir-pre.yaml"] = {
        "model": {"swinir": SWINIR},
        "dataset": {"is_coco": True, "train": coco_v1_train,
                    "val": coco_val("val2017-deg/lq")},
        "train": {"seed": 231, "precision": "fp16",
                  "exp_dir": "experiments/det/coco/000_swinir-pre",
                  "resume_swinir": "weights/codeformer_swinir.ckpt",
                  "strict_load": True, "aspect_ratio_group_factor": 3,
                  "learning_rate": "1e-4", "batch_size": 32,
                  "num_workers": 16, "train_steps": 100000, "log_every": 50,
                  "ckpt_every": 20000, "image_every": 1000},
        "val": {"batch_size": -1, "num_workers": 16, "val_every": 20000},
    }
    # 001 edtr-s4-r50 (codeformer)
    out["det/coco/train/001_edtr-s4-r50.yaml"] = {
        "model": {"pre_restoration": True, "swinir": SWINIR,
                  "cldm": cldm(True), "teacher_detnet": r50v2,
                  "detnet": r50v2, "diffusion": DIFFUSION},
        "dataset": {"is_coco": True, "train": coco_v1_train,
                    "val": coco_val("val2017-deg/lq")},
        "train": {"seed": 231, "precision": "fp16",
                  "exp_dir": "experiments/det/coco/001_edtr-s4-r50",
                  "sd_path": "weights/v2-1_512-ema-pruned.ckpt",
                  "resume_cldm": None,
                  "resume_swinir":
                      "experiments/det/coco/000_swinir-pre/checkpoints/swinir_last.pt",
                  "resume_teacher_detnet":
                      "weights/FasterRCNN_ResNet50_FPN_V2_Weights_COCO_V1.pt",
                  "resume_detnet":
                      "weights/FasterRCNN_ResNet50_FPN_V2_Weights_COCO_V1.pt",
                  "strict_load": True, "aspect_ratio_group_factor": 3,
                  "learning_rate_edtr": "1e-4", "learning_rate_detnet": "5e-3",
                  "start_timestep": 200, "num_timesteps": 4,
                  "default_prompt": "", "weight_hlf": 1.0, "weight_det": 1.0,
                  "weight_fm": 0.2, "batch_size": 16, "num_workers": 16,
                  "train_steps": 150000, "log_every": 50,
                  "ckpt_every": 10000, "image_every": 1000},
        "val": {"batch_size": -1, "num_workers": 16, "val_every": 30000,
                "start_timestep": 200, "num_timesteps": 4,
                "default_prompt": ""},
    }
    # 100 swinir-pre-v2 (realesrgan)
    out["det/coco/train/100_swinir-pre-v2.yaml"] = {
        "model": {"swinir": SWINIR},
        "dataset": {"is_coco": True, "train": coco_v2_train,
                    "batch_transform": batch_transform,
                    "val": coco_val("val2017-deg-realesrgan/lq")},
        "train": {"seed": 231, "precision": "fp16",
                  "exp_dir": "experiments/det/coco/100_swinir-pre-v2",
                  "resume_swinir": "weights/codeformer_swinir.ckpt",
                  "strict_load": True, "aspect_ratio_group_factor": 3,
                  "learning_rate": 2.5e-05, "batch_size": 32,
                  "num_workers": 16, "train_steps": 100000, "log_every": 50,
                  "ckpt_every": 20000, "image_every": 500},
        "val": {"batch_size": -1, "num_workers": 16, "val_every": 20000},
    }
    # 101 edtr-s4-r50v2 (realesrgan)
    out["det/coco/train/101_edtr-s4-r50v2.yaml"] = {
        "model": {"pre_restoration": True, "swinir": SWINIR,
                  "cldm": cldm(True), "teacher_detnet": r50v2,
                  "detnet": r50v2, "diffusion": DIFFUSION},
        "dataset": {"is_coco": True, "train": coco_v2_train,
                    "batch_transform": batch_transform,
                    "val": coco_val("val2017-deg-realesrgan/lq")},
        "train": {"seed": 132, "precision": "fp16",
                  "exp_dir": "experiments/det/coco/101_edtr-s4-r50v2",
                  "sd_path": "weights/v2-1_512-ema-pruned.ckpt",
                  "resume_swinir":
                      "experiments/det/coco/100_swinir-pre-v2/checkpoints/swinir_last.pt",
                  "resume_cldm":
                      "experiments/det/coco/001_edtr-s4-r50/checkpoints/cldm_last.pt",
                  "resume_decoder":
                      "experiments/det/coco/001_edtr-s4-r50/checkpoints/decoder_last.pt",
                  "resume_detnet":
                      "experiments/det/coco/001_edtr-s4-r50/checkpoints/detnet_last.pt",
                  "resume_teacher_detnet":
                      "weights/FasterRCNN_ResNet50_FPN_V2_Weights_COCO_V1.pt",
                  "strict_load": True, "aspect_ratio_group_factor": 3,
                  "learning_rate_edtr": "5e-5", "learning_rate_detnet": "1e-4",
                  "start_timestep": 200, "num_timesteps": 4,
                  "default_prompt": "", "weight_hlf": 1.0, "weight_det": 1.0,
                  "weight_fm": 0.2, "batch_size": 16, "num_workers": 16,
                  "train_steps": 200000, "log_every": 500,
                  "ckpt_every": 10000, "image_every": 500},
        "val": {"batch_size": -1, "num_workers": 16, "val_every": 25000,
                "start_timestep": 200, "num_timesteps": 4,
                "default_prompt": ""},
    }
    # demo
    out["det/demo.yaml"] = {
        "model": {"swinir": SWINIR, "cldm": cldm(True), "detnet": r50v2,
                  "diffusion": DIFFUSION},
        "dataset": {"is_coco": True,
                    "val": {"target":
                            "datasets.detection.RealworldDetectionDataset",
                            "params": {"root": None, "gt_size": 512,
                                       "file_backend_cfg": HDB}}},
        "test": {"start_timestep": 200, "num_timesteps": 4,
                 "default_prompt": "", "batch_size": 1, "num_workers": 16},
    }
    return out


def main():
    n = 0
    for task in ("cls", "seg", "det"):
        ds = TASKS[task]["ds_name"]
        for rel, cfg in build_task_configs(task).items():
            path = os.path.join(OUT, task, ds, rel)
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "w") as f:
                f.write(f"# generated by tools/gen_configs.py — {task}/{ds}/{rel}\n")
                yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=None,
                               width=100)
            n += 1
    for rel, cfg in build_coco_configs().items():
        path = os.path.join(OUT, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            f.write(f"# generated by tools/gen_configs.py — {rel}\n")
            yaml.safe_dump(cfg, f, sort_keys=False, default_flow_style=None,
                           width=100)
        n += 1
    print(f"wrote {n} configs under {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
