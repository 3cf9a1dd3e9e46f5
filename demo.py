#!/usr/bin/env python
"""Real-world arbitrary-size EDTR inference demo (restore + detect + draw).

Parity: reference ``demo.py`` (/root/reference, SURVEY.md §3.3):
  resize longer side to 512 (or --scale) -> pad_if_smaller(512) +
  pad_to_multiples_of(64) -> optionally tiled SwinIR -> (tiled) VAE encode ->
  q_sample@start_timestep -> K-step sampler with optional latent tiling ->
  (tiled) decode + wavelet -> detection in resize/tile/direct modes ->
  save restored image + box overlay cropped to the original size.

Checkpoint: one combined dict {swinir, cldm, decoder, detnet} (demo.py:49-54)
loaded through ``edtr_tpu.utils.checkpoint.load_combined``; orbax submodule
directories also work via --ckpt-dir.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), ".")))

from argparse import ArgumentParser

import numpy as np


def main(args):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from edtr_tpu.config import instantiate_from_config, load_config
    from edtr_tpu.pipeline import build_pipeline_from_config
    from edtr_tpu.train.runner import build_edtr_models, init_detnet_params
    from edtr_tpu.utils import checkpoint as ckpt_utils
    from edtr_tpu.utils.image import pad_if_smaller, pad_to_multiples_of
    from edtr_tpu.utils.logging_utils import set_seed
    from edtr_tpu.utils.tiling import make_tiled_fn, sliding_windows
    from edtr_tpu.ops import boxes as box_ops
    from edtr_tpu.data.voc import VOC_LABELS

    set_seed(args.seed)
    cfg = load_config(args.config)
    pipe, params = build_edtr_models(cfg)
    detnet = instantiate_from_config(cfg["model"]["detnet"], dtype=jnp.bfloat16)
    det_params = init_detnet_params(detnet, jax.random.PRNGKey(args.seed))

    if args.ckpt and os.path.exists(args.ckpt):
        combined = ckpt_utils.load_combined(args.ckpt, pipe)
        for k in ("swinir", "unet", "controlnet", "vae", "clip"):
            if k in combined:
                params[k] = combined[k]
        if "swinir" in combined and pipe.swinir is not None and pipe.swinir.lane_pad:
            # checkpoints are saved unpadded; re-apply the exact zero-pad
            # relayout (utils/convert.py:pad_swinir_lanes)
            from edtr_tpu.utils import convert as _C

            params["swinir"] = _C.pad_swinir_lanes(
                params["swinir"], lane_pad=pipe.swinir.lane_pad,
                heads=pipe.swinir.num_heads[0])

    img_dir = os.path.join(args.output, "images")
    box_dir = os.path.join(args.output, "boxes")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(box_dir, exist_ok=True)

    paths = (
        [args.input]
        if os.path.isfile(args.input)
        else sorted(
            os.path.join(args.input, f)
            for f in os.listdir(args.input)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp", ".webp"))
        )
    )

    key = jax.random.PRNGKey(args.seed)
    c_txt = pipe.cldm.encode_text(params, [""])
    for path in paths:
        img = Image.open(path).convert("RGB")
        if args.scale == -1.0:
            scale = 512 / max(img.size)
        else:
            scale = args.scale
        img = img.resize(
            (int(round(img.size[0] * scale)), int(round(img.size[1] * scale))),
            Image.BICUBIC,
        )
        x = jnp.asarray(np.asarray(img, np.float32) / 255.0)[None]  # (1,H,W,3)
        h0, w0 = x.shape[1], x.shape[2]
        x = pad_if_smaller(x, 512)
        x = pad_to_multiples_of(x, 64)

        # pre-restoration (optionally tiled)
        if args.pre_res_tiled and max(x.shape[1:3]) >= 512:
            sw = make_tiled_fn(
                lambda t: pipe.swinir.apply({"params": params["swinir"]}, t),
                args.pre_res_tile_size, args.pre_res_tile_stride,
            )
            pre_res = sw(x)
        else:
            pre_res = pipe.pre_restore(params, x)

        # condition + partial diffusion + short-step denoise
        z_pre = pipe.cldm.vae_encode(
            params, pre_res * 2 - 1, sample=False,
            tiled=args.vae_encoder_tiled, tile_size=args.vae_encoder_tile_size,
        )
        cond = dict(c_txt=c_txt, c_img=z_pre)
        key, k1, k2 = jax.random.split(key, 3)
        noise = jax.random.normal(k1, z_pre.shape, z_pre.dtype)
        t = jnp.full((1,), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(z_pre, t, noise)
        from edtr_tpu.diffusion.sampler import sample_scan
        from edtr_tpu.utils.tiling import tiled_model_fn
        from edtr_tpu.utils.image import wavelet_reconstruction

        model_fn = pipe.cldm.model_fn(params)
        if args.cldm_tiled:
            model_fn = tiled_model_fn(
                model_fn, args.cldm_tile_size // 8, args.cldm_tile_stride // 8
            )
        z = sample_scan(model_fn, pipe.schedule, z_T, cond, k2)
        decoded = (
            pipe.cldm.vae_decode(
                params, z, tiled=args.vae_decoder_tiled,
                tile_size=args.vae_decoder_tile_size,
            )
            + 1
        ) / 2
        res = wavelet_reconstruction(decoded, pre_res)

        # detection: resize | tile | direct (demo.py:129-160)
        det_fn = lambda im: detnet.apply(det_params, im)[0]  # full variables dict
        if args.detection_type == "resize":
            s = 512 / max(res.shape[1:3])
            rh, rw = int(res.shape[1] * s), int(res.shape[2] * s)
            res_resize = jax.image.resize(res, (1, rh, rw, 3), "bilinear")
            pred = jax.tree.map(lambda v: np.asarray(v[0]), det_fn(res_resize))
            pred["boxes"] = pred["boxes"] / s
        elif args.detection_type == "tile":
            all_b, all_s, all_l = [], [], []
            h2, w2 = res.shape[1], res.shape[2]
            for (hi, hi_end, wi, wi_end) in sliding_windows(
                h2, w2, args.detection_tile_size, args.detection_tile_stride
            ):
                tile = res[:, hi:hi_end, wi:wi_end]
                p = jax.tree.map(lambda v: np.asarray(v[0]), det_fn(tile))
                keep = (p["scores"] >= 0.6) & p["valid"]
                b = p["boxes"][keep] + np.array([wi, hi, wi, hi])
                all_b.append(b)
                all_s.append(p["scores"][keep])
                all_l.append(p["labels"][keep])
            boxes = np.concatenate(all_b)
            scores = np.concatenate(all_s)
            labels = np.concatenate(all_l)
            if len(boxes):
                import jax.numpy as jnp2

                keep = np.asarray(
                    box_ops.batched_nms_mask(
                        jnp.asarray(boxes, jnp.float32), jnp.asarray(scores),
                        jnp.asarray(labels), args.detection_tile_nms_threshold,
                    )
                )
                boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
            pred = dict(boxes=boxes, scores=scores, labels=labels,
                        valid=np.ones(len(boxes), bool))
        else:
            pred = jax.tree.map(lambda v: np.asarray(v[0]), det_fn(res))

        basename = os.path.splitext(os.path.basename(path))[0]
        out = np.clip(np.asarray(res[0, :h0, :w0]), 0, 1)
        Image.fromarray((out * 255).astype(np.uint8)).save(
            os.path.join(img_dir, basename + ".png")
        )
        boxed = draw_boxes(out, pred, args.threshold)
        Image.fromarray(boxed).save(os.path.join(box_dir, basename + ".png"))
        print(f"{path}: {int(np.sum(pred.get('valid', 1) * (pred['scores'] > args.threshold)))} boxes")
    print("Done!")


def draw_boxes(img01: np.ndarray, pred: dict, threshold: float) -> np.ndarray:
    """Box overlay; parity ``draw_box`` (utils/detection.py:71-138)."""
    import cv2

    from edtr_tpu.data.voc import VOC_LABELS

    img = (img01 * 255).astype(np.uint8).copy()
    valid = pred.get("valid", np.ones(len(pred["scores"]), bool))
    for box, score, label, v in zip(
        pred["boxes"], pred["scores"], pred["labels"], valid
    ):
        if not v or score < threshold:
            continue
        x1, y1, x2, y2 = (int(round(float(c))) for c in box)
        color = tuple(int(c) for c in np.random.default_rng(int(label)).integers(64, 255, 3))
        cv2.rectangle(img, (x1, y1), (x2, y2), color, 2)
        name = VOC_LABELS[int(label) - 1] if 0 < int(label) <= len(VOC_LABELS) else str(int(label))
        cv2.putText(img, f"{name}:{float(score):.2f}", (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return img


if __name__ == "__main__":
    parser = ArgumentParser()
    parser.add_argument("--config", type=str, default="configs/det/demo.yaml")
    parser.add_argument("--ckpt", type=str, default=None)
    parser.add_argument("--input", type=str, required=True)
    parser.add_argument("--output", type=str, default="results")
    parser.add_argument("--seed", type=int, default=217)
    parser.add_argument("--scale", type=float, default=-1.0)
    parser.add_argument("--threshold", type=float, default=0.8)
    parser.add_argument("--pre-res-tiled", action="store_true")
    parser.add_argument("--pre-res-tile-size", type=int, default=512)
    parser.add_argument("--pre-res-tile-stride", type=int, default=256)
    parser.add_argument("--vae-encoder-tiled", action="store_true")
    parser.add_argument("--vae-encoder-tile-size", type=int, default=256)
    parser.add_argument("--vae-decoder-tiled", action="store_true")
    parser.add_argument("--vae-decoder-tile-size", type=int, default=256)
    parser.add_argument("--cldm-tiled", action="store_true")
    parser.add_argument("--cldm-tile-size", type=int, default=512)
    parser.add_argument("--cldm-tile-stride", type=int, default=256)
    parser.add_argument("--detection-type", type=str, default="resize",
                        choices=["resize", "tile", "direct"])
    parser.add_argument("--detection-tile-size", type=int, default=512)
    parser.add_argument("--detection-tile-stride", type=int, default=256)
    parser.add_argument("--detection-tile-nms-threshold", type=float, default=0.3)
    main(parser.parse_args())
