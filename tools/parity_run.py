#!/usr/bin/env python
"""One-command real-checkpoint parity harness (VERDICT r1 #9).

Given reference weight paths, convert them, restore a fixed image through the
EDTR-s4 pipeline, and dump per-stage activations + metrics so parity against
the PyTorch reference is a single run + numpy diff the moment weights land.

Stages dumped to <out>/stages.npz:
  lq            padded [0,1] NHWC input
  pre_restored  SwinIR output
  z_pre         VAE posterior mode latent (scaled)
  z_partial     q_sample at start_timestep (seeded noise)
  pred_x0_k     per-sampler-step x0 predictions (k = 0..K-1)
  z             final latent
  decoded       VAE decode
  restored      after wavelet color fix
  det_boxes/det_scores/det_labels  (when a detnet checkpoint is given)

Usage:
  python tools/parity_run.py --config configs/det/voc2012/test/007_edtr-s4.yaml \
      --image input.png --out results/parity \
      [--sd weights/v2-1_512-ema-pruned.ckpt] [--swinir ...] [--cldm ...] \
      [--decoder ...] [--detnet ...] [--seed 231]

Matching reference flow: ``main/det/test_edtr.py:100-160`` (load_pretrained_sd
key map ``model/cldm.py:47-77``).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--image", required=True)
    ap.add_argument("--out", default="results/parity")
    ap.add_argument("--sd", default=None, help="SD2.1 checkpoint path")
    ap.add_argument("--swinir", default=None)
    ap.add_argument("--cldm", default=None, help="trained controlnet/cldm ckpt")
    ap.add_argument("--decoder", default=None, help="trained VAE decoder ckpt")
    ap.add_argument("--detnet", default=None)
    ap.add_argument("--seed", type=int, default=231)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax

    # the axon sitecustomize force-registers the TPU ahead of JAX_PLATFORMS;
    # honor an explicit JAX_PLATFORMS=cpu (CI / weightless smoke runs)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from PIL import Image

    from edtr_tpu.config import load_config
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.train.harness import list_to_batch
    from edtr_tpu.train.runner import (build_detnet, build_edtr_models,
                                       init_detnet_params)
    from edtr_tpu.utils import checkpoint as ckpt
    from edtr_tpu.utils import convert as C
    from edtr_tpu.utils.image import calculate_psnr, wavelet_reconstruction

    cfg = load_config(args.config)
    section = "test" if "test" in cfg else "train"
    # CLI overrides land in the config's resume fields so build_edtr_models
    # does the conversions (load_pretrained_sd surgery incl. controlnet init)
    overrides = {"sd_path": args.sd, "resume_swinir": args.swinir,
                 "resume_cldm": args.cldm}
    for k, v in overrides.items():
        if v:
            cfg[section][k] = v

    pipe, params = build_edtr_models(cfg)
    loaded = {k: bool(v and os.path.exists(str(v)))
              for k, v in dict(sd=args.sd, swinir=args.swinir, cldm=args.cldm,
                               decoder=args.decoder, detnet=args.detnet).items()}
    for name, ok in loaded.items():
        if not ok:
            print(f"NOTE: --{name} not provided/found -> random init "
                  "(activations are structural only, not parity-grade)")
    if args.decoder and os.path.exists(args.decoder):
        dec = ckpt.load_torch_state_dict(args.decoder)
        params["vae"]["decoder"] = C.convert_vae_decoder(
            C.torch_state_dict_to_numpy(dec))

    img = np.asarray(Image.open(args.image).convert("RGB"), np.float32) / 255.0
    h0, w0 = img.shape[:2]
    # demo preprocessing: longer side -> size (demo.py:80-90)
    scale = args.size / max(h0, w0)
    if scale != 1.0:
        img = np.asarray(Image.fromarray((img * 255).astype(np.uint8)).resize(
            (max(1, round(w0 * scale)), max(1, round(h0 * scale))),
            Image.BICUBIC), np.float32) / 255.0
    lq = jnp.asarray(list_to_batch([img], args.size))

    key = jax.random.PRNGKey(args.seed)
    stages = {"lq": np.asarray(lq)}

    pre = pipe.pre_restore(params, lq)
    stages["pre_restored"] = np.asarray(pre, np.float32)

    z_pre = pipe.cldm.vae_encode(params, pre * 2 - 1, sample=False)
    stages["z_pre"] = np.asarray(z_pre, np.float32)

    c_txt = pipe.cldm.encode_text(
        params, [cfg[section].get("default_prompt", "")])
    cond = dict(c_txt=c_txt, c_img=z_pre)

    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, z_pre.shape, z_pre.dtype)
    t = jnp.full((1,), pipe.start_timestep, jnp.int32)
    z_partial = pipe.diffusion.q_sample(z_pre, t, noise)
    stages["z_partial"] = np.asarray(z_partial, np.float32)

    z, inter = sample_scan(pipe.cldm.model_fn(params), pipe.schedule,
                           z_partial, cond, k2, return_intermediates=True)
    for i in range(inter.shape[0]):
        stages[f"pred_x0_{i}"] = np.asarray(inter[i], np.float32)
    stages["z"] = np.asarray(z, np.float32)

    decoded = (pipe.cldm.vae_decode(params, z) + 1) / 2
    stages["decoded"] = np.asarray(decoded, np.float32)
    restored = wavelet_reconstruction(decoded, pre)
    stages["restored"] = np.asarray(restored, np.float32)

    restored_01 = jnp.clip(jnp.nan_to_num(restored), 0, 1)
    metrics = {
        "psnr_restored_vs_lq": float(calculate_psnr(restored_01, lq)[0]),
        "psnr_pre_vs_lq": float(calculate_psnr(pre, lq)[0]),
        "loaded": loaded,
        "seed": args.seed,
        "used_timesteps": [int(x) for x in pipe.used_timesteps],
    }

    if "detnet" in cfg["model"]:
        detnet = build_detnet(cfg, "detnet", dtype=jnp.bfloat16)
        det_vars = init_detnet_params(detnet, jax.random.PRNGKey(args.seed),
                                      image_size=args.size)
        if args.detnet and os.path.exists(args.detnet):
            det_vars = ckpt.load_network(args.detnet, template=det_vars,
                                         strict=False)
        dets, _, _ = detnet.apply(det_vars, restored)
        valid = np.asarray(dets["valid"][0])
        stages["det_boxes"] = np.asarray(dets["boxes"][0])[valid]
        stages["det_scores"] = np.asarray(dets["scores"][0])[valid]
        stages["det_labels"] = np.asarray(dets["labels"][0])[valid]
        metrics["n_detections"] = int(valid.sum())

    os.makedirs(args.out, exist_ok=True)
    np.savez_compressed(os.path.join(args.out, "stages.npz"), **stages)
    with open(os.path.join(args.out, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    out01 = np.clip(np.nan_to_num(stages["restored"][0]), 0, 1)
    Image.fromarray((out01 * 255).astype(np.uint8)).save(
        os.path.join(args.out, "restored.png"))
    print(json.dumps(metrics, indent=2))
    print(f"stages -> {os.path.join(args.out, 'stages.npz')}")


if __name__ == "__main__":
    main()
