"""EDTR restoration pipeline: the flagship end-to-end inference graph.

Parity: the per-image eval loop of ``main/det/test_edtr.py:100-137``
(/root/reference), compiled here as ONE jitted graph:

    pre_res   = swinir(lq)                               # pre-restoration
    z_pre     = vae_encode(pre_res*2-1, mode)            # condition latent
    cond      = {c_txt: clip(""), c_img: z_pre}
    z_T       = q_sample(z_pre, t=start_timestep, eps)   # partial diffusion
    z_0       = scan over K spaced posterior steps       # short-step denoise
    restored  = wavelet_recon((vae_decode(z_0)+1)/2, pre_res)

The timestep schedule is the EDTR rule
``[start/K * i for i in 1..K]`` (``main/det/train_edtr.py:76-78``), e.g.
[50, 100, 150, 200] for EDTR-s4.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from edtr_tpu.diffusion.sampler import SpacedSampler, sample_scan
from edtr_tpu.diffusion.schedule import Diffusion
from edtr_tpu.models.cldm import ControlLDM
from edtr_tpu.models.swinir import SwinIR
from edtr_tpu.utils.image import wavelet_reconstruction

Params = Dict[str, Any]


def edtr_used_timesteps(start_timestep: int, num_timesteps: int) -> List[int]:
    """``main/det/train_edtr.py:76-78``: K evenly spaced steps ending at start."""
    return [int(start_timestep / num_timesteps * i) for i in range(1, num_timesteps + 1)]


class EDTRPipeline:
    """Bundles SwinIR + ControlLDM + diffusion tables into one restore graph."""

    def __init__(
        self,
        swinir: Optional[SwinIR],
        cldm: ControlLDM,
        diffusion: Diffusion,
        start_timestep: int = 200,
        num_timesteps: int = 4,
    ):
        self.swinir = swinir
        self.cldm = cldm
        self.diffusion = diffusion
        self.start_timestep = int(start_timestep)
        self.num_timesteps = int(num_timesteps)
        self.used_timesteps = edtr_used_timesteps(start_timestep, num_timesteps)
        self.sampler = SpacedSampler(np.asarray(diffusion.betas, np.float64))
        self.schedule = self.sampler.make_schedule(
            self.num_timesteps, self.used_timesteps
        )

    def pre_restore(self, params: Params, lq: jnp.ndarray) -> jnp.ndarray:
        """SwinIR pre-restoration (identity when the config disables it)."""
        if self.swinir is None:
            return lq
        return self.swinir.apply({"params": params["swinir"]}, lq)

    def restore(
        self,
        params: Params,
        lq: jnp.ndarray,
        rng: jax.Array,
        c_txt: Optional[jnp.ndarray] = None,
        tiled_diffusion: bool = False,
        tile_size: int = -1,
        tile_stride: int = -1,
    ) -> Dict[str, jnp.ndarray]:
        """Full EDTR restore of an NHWC [0,1] batch; jit-compatible.

        ``c_txt`` may be precomputed (tokenization is host-side); defaults to
        the empty-prompt embedding computed on the fly.
        """
        cldm = self.cldm
        pre_res = self.pre_restore(params, lq)

        z_pre = cldm.vae_encode(params, pre_res * 2 - 1, sample=False)
        if c_txt is None:
            c_txt = cldm.encode_text(params, [""] * lq.shape[0])
        cond = dict(c_txt=c_txt, c_img=z_pre)

        rng_noise, rng_sample = jax.random.split(rng)
        noise = jax.random.normal(rng_noise, z_pre.shape, dtype=z_pre.dtype)
        t = jnp.full((lq.shape[0],), self.start_timestep, jnp.int32)
        z_partial = self.diffusion.q_sample(z_pre, t, noise)

        model_fn = cldm.model_fn(params)
        if tiled_diffusion:
            from edtr_tpu.utils.tiling import tiled_model_fn

            model_fn = tiled_model_fn(model_fn, tile_size, tile_stride)

        z = sample_scan(model_fn, self.schedule, z_partial, cond, rng_sample)
        decoded = (cldm.vae_decode(params, z) + 1) / 2
        restored = wavelet_reconstruction(decoded, pre_res)
        return dict(restored=restored, pre_restored=pre_res, z=z)


def build_pipeline_from_config(cfg, dtype=None) -> EDTRPipeline:
    """Construct the pipeline from a reference-style YAML config tree."""
    from edtr_tpu.config import Config, instantiate_from_config

    model_cfg = cfg["model"] if "model" in cfg else cfg
    swinir = None
    if model_cfg.get("pre_restoration", True) and "swinir" in model_cfg:
        sw_cfg = model_cfg["swinir"]
        sw_params = dict(sw_cfg.get("params", {}) or {})
        from edtr_tpu.models.swinir import SwinIR as _SwinIR

        sw_params = {
            k: (tuple(v) if isinstance(v, list) else v) for k, v in sw_params.items()
        }
        # MXU lane alignment for the flagship 180-dim SwinIR (head dim
        # 30 -> 32, width 180 -> 192 = 1.5x128 lanes). Inference configs
        # only: the zero-pad exactness contract (models/swinir.py lane_pad)
        # holds for loaded-then-padded params, and training from a padded
        # init is NOT the same function. Params must go through
        # utils/convert.py:pad_swinir_lanes (build_edtr_models does).
        # Default ON: interleaved same-process A/B, 3 rounds x 30 iters,
        # pad12 9.578 vs pad0 9.703 ms/img median (+1.5% consistent;
        # results/chip_queue/ab_swinir_pad.json).
        import os as _os

        if (_os.environ.get("EDTR_SWINIR_PAD", "1") == "1"
                and "train" not in cfg
                and sw_params.get("embed_dim") == 180
                and set(sw_params.get("num_heads", ())) == {6}):
            sw_params["lane_pad"] = 12
        swinir = _SwinIR(dtype=dtype, **sw_params)

    cldm_cfg = model_cfg["cldm"]
    cp = cldm_cfg["params"]
    vae_cfg = dict(cp["vae_cfg"].to_dict() if isinstance(cp["vae_cfg"], Config) else cp["vae_cfg"])
    if "train" in cfg and vae_cfg.get("train_decoder", False):
        # training backprops through the decoder at 512² — remat its
        # resblocks (UNet/ControlNet use_checkpoint comes from the config)
        dd = dict(vae_cfg.get("ddconfig", {}) or {})
        dd.setdefault("use_checkpoint", True)
        vae_cfg["ddconfig"] = dd
    cldm = ControlLDM(
        unet_cfg=dict(cp["unet_cfg"].to_dict() if isinstance(cp["unet_cfg"], Config) else cp["unet_cfg"]),
        vae_cfg=vae_cfg,
        clip_cfg=dict(cp["clip_cfg"].to_dict() if isinstance(cp["clip_cfg"], Config) else cp["clip_cfg"]),
        controlnet_cfg=dict(cp["controlnet_cfg"].to_dict() if isinstance(cp["controlnet_cfg"], Config) else cp["controlnet_cfg"]),
        latent_scale_factor=cp["latent_scale_factor"],
        dtype=dtype,
    )
    diffusion = instantiate_from_config(model_cfg["diffusion"])

    train_cfg = cfg.get("train", None) or cfg.get("test", None) or {}
    start_t = train_cfg.get("start_timestep", 200) if train_cfg else 200
    num_t = train_cfg.get("num_timesteps", 4) if train_cfg else 4
    return EDTRPipeline(swinir, cldm, diffusion, start_t, num_t)
