"""ControlLDM: the UNet + VAE + CLIP + ControlNet bundle.

TPU-native re-design of ``ControlLDM`` (``model/cldm.py:17-194``
in /root/reference). Torch's stateful nn.Module becomes a *spec* object
holding four flax module definitions plus pure apply methods over an explicit
``params`` pytree with submodule groups::

    params = {"unet": ..., "vae": ..., "clip": ..., "controlnet": ...}

The same grouping is used by checkpointing (reference saves per-submodule
state dicts, ``main/det/train_edtr.py:268-273``) and by the optimizer
partition (ControlNet + VAE-decoder trainable, everything else frozen).

Weight surgery parity:
  load_pretrained_sd       -> model/cldm.py:47-77  (via utils/convert)
  load_controlnet_from_unet-> model/cldm.py:84-105 (zero-pad hint channels)
  forward                  -> model/cldm.py:166-194 (control scales then UNet)

The dead ``tail_block``/``woSD`` path (model/cldm.py:36-44,173-187) is not
ported — unreachable from any config (SURVEY.md §7 non-goals).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from edtr_tpu.models.clip import CLIPTextEncoder
from edtr_tpu.models.controlnet import ControlNet
from edtr_tpu.models.unet import UNetModel
from edtr_tpu.models.vae import AutoencoderKL
from edtr_tpu.data.tokenizer import tokenize
from edtr_tpu.utils import convert as C

Params = Dict[str, Any]

_UNET_FIELDS = (
    "in_channels out_channels model_channels num_res_blocks attention_resolutions "
    "channel_mult num_heads num_head_channels transformer_depth context_dim "
    "use_linear_in_transformer use_checkpoint"
).split()
_CN_FIELDS = (
    "in_channels hint_channels model_channels num_res_blocks attention_resolutions "
    "channel_mult num_heads num_head_channels transformer_depth context_dim "
    "use_linear_in_transformer use_checkpoint"
).split()


def _filter(cfg: Dict[str, Any], fields) -> Dict[str, Any]:
    out = {}
    for k in fields:
        if k in cfg and cfg[k] is not None:
            v = cfg[k]
            if isinstance(v, (list,)):
                v = tuple(v)
            out[k] = v
    return out


class ControlLDM:
    def __init__(
        self,
        unet_cfg: Dict[str, Any],
        vae_cfg: Dict[str, Any],
        clip_cfg: Dict[str, Any],
        controlnet_cfg: Dict[str, Any],
        latent_scale_factor: float,
        tail_block: bool = False,
        dtype: Any = None,
    ):
        assert not tail_block, "woSD/tail_block path is dead code in the reference"
        unet_cfg = dict(unet_cfg)
        controlnet_cfg = dict(controlnet_cfg)
        vae_cfg = dict(vae_cfg)
        clip_cfg = dict(clip_cfg)

        self.unet_cfg = unet_cfg
        self.controlnet_cfg = controlnet_cfg
        self.scale_factor = float(latent_scale_factor)
        self.control_scales: List[float] = [1.0] * 13
        self.dtype = dtype

        self.unet = UNetModel(dtype=dtype, **_filter(unet_cfg, _UNET_FIELDS))
        self.controlnet = ControlNet(dtype=dtype, **_filter(controlnet_cfg, _CN_FIELDS))
        self.vae = AutoencoderKL(
            ddconfig=dict(vae_cfg.get("ddconfig", {})),
            embed_dim=vae_cfg.get("embed_dim", 4),
            train_decoder=vae_cfg.get("train_decoder", False),
            dtype=dtype,
        )
        text_cfg = dict(clip_cfg.get("text_cfg", {}))
        self.clip = CLIPTextEncoder(
            vocab_size=text_cfg.get("vocab_size", 49408),
            width=text_cfg.get("width", 1024),
            heads=text_cfg.get("heads", 16),
            layers=text_cfg.get("layers", 24),
            context_length=text_cfg.get("context_length", 77),
            penultimate=(clip_cfg.get("layer", "penultimate") == "penultimate"),
            dtype=dtype,
        )

    # -- init / weight surgery -------------------------------------------------
    def init_params(self, rng: jax.Array, latent_hw: int = 8) -> Params:
        """Random init (shapes only — real runs load converted SD weights).

        Jitted as ONE program: eager flax init pays per-op tunnel RTT on
        the axon TPU (minutes for SD2.1-scale trees — the round-1 gotcha
        that stalled tools/verify_pad_drive.py in round 5)."""

        def _init(key):
            ks = jax.random.split(key, 4)
            x = jnp.zeros((1, latent_hw, latent_hw, self.unet.in_channels))
            t = jnp.zeros((1,), jnp.int32)
            ctx = jnp.zeros((1, self.clip.context_length, self.clip.width))
            img = jnp.zeros((1, latent_hw * 8, latent_hw * 8, 3))
            tokens = jnp.zeros((1, self.clip.context_length), jnp.int32)
            return {
                "unet": self.unet.init(ks[0], x, t, ctx)["params"],
                "controlnet": self.controlnet.init(ks[1], x, x, t, ctx)["params"],
                "vae": self.vae.init(ks[2], img, sample_posterior=False)["params"],
                "clip": self.clip.init(ks[3], tokens)["params"],
            }

        return jax.jit(_init)(rng)

    def _arch_kwargs(self, cfg: Dict[str, Any]) -> Dict[str, Any]:
        return dict(
            model_channels=cfg.get("model_channels", 320),
            num_res_blocks=cfg.get("num_res_blocks", 2),
            channel_mult=tuple(cfg.get("channel_mult", (1, 2, 4, 4))),
            attention_resolutions=tuple(cfg.get("attention_resolutions", (4, 2, 1))),
            transformer_depth=cfg.get("transformer_depth", 1),
            use_linear_in_transformer=cfg.get("use_linear_in_transformer", True),
        )

    def load_pretrained_sd(self, sd: Dict[str, np.ndarray]) -> Params:
        """Convert a full SD2.1 checkpoint into unet/vae/clip param groups.

        Parity: ``model/cldm.py:47-77`` (module_map key remapping).
        """
        split = C.split_sd_checkpoint(sd)
        dd = self.vae.ddconfig or {}
        n_layers = self.clip.layers - 1 if self.clip.penultimate else self.clip.layers
        return {
            "unet": C.convert_ldm_unet(split["unet"], **self._arch_kwargs(self.unet_cfg)),
            "vae": C.convert_autoencoder_kl(
                split["vae"],
                ch=dd.get("ch", 128),
                ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
                num_res_blocks=dd.get("num_res_blocks", 2),
            ),
            "clip": C.convert_clip_text(split["clip"], prefix="model", layers=n_layers),
        }

    def load_controlnet_from_ckpt(self, sd: Dict[str, np.ndarray]) -> Params:
        return C.convert_controlnet(sd, **self._arch_kwargs(self.controlnet_cfg))

    def load_controlnet_from_unet(self, unet_params: Params) -> Params:
        return C.controlnet_from_unet(
            unet_params, hint_channels=self.controlnet.hint_channels
        )

    # -- pure apply fns ---------------------------------------------------------
    def vae_encode(
        self,
        params: Params,
        image: jnp.ndarray,
        sample: bool = True,
        rng: Optional[jax.Array] = None,
        tiled: bool = False,
        tile_size: int = -1,
    ) -> jnp.ndarray:
        """Scaled latent of ``image`` (NHWC in [-1, 1]); ``model/cldm.py:107-134``."""
        if tiled:
            from edtr_tpu.utils.tiling import tiled_vae_encode

            posterior = tiled_vae_encode(self, params, image, tile_size)
        else:
            posterior = self.vae.apply(
                {"params": params["vae"]}, image, method=self.vae.encode
            )
        z = posterior.sample(rng) if sample else posterior.mode()
        return z * self.scale_factor

    def vae_decode(
        self,
        params: Params,
        z: jnp.ndarray,
        tiled: bool = False,
        tile_size: int = -1,
    ) -> jnp.ndarray:
        """Decode scaled latent; ``model/cldm.py:136-156``."""
        if tiled:
            from edtr_tpu.utils.tiling import tiled_vae_decode

            return tiled_vae_decode(self, params, z / self.scale_factor, tile_size)
        return self.vae.apply(
            {"params": params["vae"]}, z / self.scale_factor, method=self.vae.decode
        )

    def encode_text(self, params: Params, prompt: Sequence[str]) -> jnp.ndarray:
        tokens = jnp.asarray(tokenize(list(prompt)))
        return self.clip.apply({"params": params["clip"]}, tokens)

    def prepare_condition(
        self, params: Params, clean: jnp.ndarray, prompt: Optional[Sequence[str]] = None
    ) -> Dict[str, jnp.ndarray]:
        """cond dict from a pre-restored image in [0,1]; ``model/cldm.py:158-164``."""
        if prompt is None:
            prompt = [""] * clean.shape[0]
        return dict(
            c_txt=self.encode_text(params, prompt),
            c_img=self.vae_encode(params, clean * 2 - 1, sample=False),
        )

    def __call__(
        self,
        params: Params,
        x_noisy: jnp.ndarray,
        t: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
    ) -> jnp.ndarray:
        """eps prediction; parity ``model/cldm.py:166-194``."""
        control = self.controlnet.apply(
            {"params": params["controlnet"]},
            x_noisy, cond["c_img"], t, cond["c_txt"],
        )
        control = [c * s for c, s in zip(control, self.control_scales)]
        return self.unet.apply(
            {"params": params["unet"]},
            x_noisy, t, cond["c_txt"], control=control,
        )

    def model_fn(self, params: Params):
        """Bind params -> ``fn(x, t, cond)`` for the sampler/diffusion APIs."""
        return lambda x, t, cond: self(params, x, t, cond)
