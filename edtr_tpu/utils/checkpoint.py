"""Checkpointing: Orbax saves with the reference's per-submodule grouping,
plus transparent loading of PyTorch ``.pt/.ckpt`` files through the converter.

Parity map (/root/reference):
  per-submodule ``torch.save`` every ckpt_every + ``_last``
      -> main/det/train_edtr.py:268-273,371-377  => :func:`save_checkpoint`
  ``load_network`` (strips ``module.``, reports key diffs)
      -> utils/common.py:272-334                 => :func:`load_network`
  combined demo checkpoint {swinir, cldm, decoder, detnet}
      -> demo.py:49-54                           => :func:`load_combined`

Note the reference never saves optimizer/step state (resume is
initialization-only, SURVEY.md §5.4); we additionally support full train
state via orbax for real elastic resume.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, Optional

import jax
import numpy as np

Params = Dict[str, Any]


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree (params / train state) with orbax."""
    ocp = _orbax()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    ocp = _orbax()
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if template is not None:
            return ckptr.restore(path, template)
        return ckptr.restore(path)


def save_submodules(ckpt_dir: str, params: Params, step: Optional[int] = None) -> None:
    """Per-submodule saves mirroring the reference's grouping.

    ``{name}_{step}`` and ``{name}_last`` directories per submodule
    (controlnet / decoder / detnet / swinir / ...), parity
    ``main/det/train_edtr.py:268-273``.
    """
    os.makedirs(ckpt_dir, exist_ok=True)
    for name, sub in params.items():
        if step is not None:
            save_checkpoint(os.path.join(ckpt_dir, f"{name}_{step}"), sub)
        save_checkpoint(os.path.join(ckpt_dir, f"{name}_last"), sub)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint file into numpy, stripping ``module.``.

    Parity: ``load_network`` prefix handling (utils/common.py:272-334).
    """
    import torch

    from edtr_tpu.utils.convert import torch_state_dict_to_numpy

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    sd = {}
    for k, v in obj.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v
    return torch_state_dict_to_numpy(sd)


def load_network(
    path: str,
    converter: Optional[Callable[[Dict[str, np.ndarray]], Params]] = None,
    template: Optional[Params] = None,
    strict: bool = True,
) -> Params:
    """Load params from either an orbax dir or a torch file.

    ``converter`` maps a torch numpy state dict onto our param pytree; it is
    required for ``.pt/.pth/.ckpt`` inputs. Key diffs are reported like the
    reference's ``_print_different_keys_loading`` when ``strict=False``.
    """
    if path.endswith((".pt", ".pth", ".ckpt", ".safetensors")):
        assert converter is not None, "torch checkpoints need a converter"
        sd = load_torch_state_dict(path)
        params = converter(sd)
    else:
        params = restore_checkpoint(path, template)
    if template is not None:
        _report_key_diff(template, params, strict)
    return params


def _report_key_diff(template: Params, loaded: Params, strict: bool) -> None:
    t_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]}
    l_paths = {jax.tree_util.keystr(p) for p, _ in jax.tree_util.tree_flatten_with_path(loaded)[0]}
    missing = t_paths - l_paths
    unexpected = l_paths - t_paths
    if missing or unexpected:
        msg = (
            f"checkpoint key diff: {len(missing)} missing "
            f"(e.g. {sorted(missing)[:3]}), {len(unexpected)} unexpected "
            f"(e.g. {sorted(unexpected)[:3]})"
        )
        if strict:
            raise ValueError(msg)
        print(f"[load_network] {msg}")


def load_combined(path: str, pipe) -> Params:
    """Load the demo's single combined checkpoint (demo.py:49-54).

    A torch dict with keys {swinir, cldm, decoder, detnet}; each converted
    through the matching architecture converter from ``pipe``.
    """
    import torch

    from edtr_tpu.utils import convert as C

    obj = torch.load(path, map_location="cpu", weights_only=False)
    out: Params = {}
    if "swinir" in obj and pipe.swinir is not None:
        sw = C.torch_state_dict_to_numpy(obj["swinir"])
        out["swinir"] = C.convert_swinir(
            sw, depths=tuple(pipe.swinir.depths),
            unshuffle=pipe.swinir.unshuffle, upsampler=pipe.swinir.upsampler,
            sf=pipe.swinir.sf,
        )
    if "cldm" in obj:
        sd = C.torch_state_dict_to_numpy(obj["cldm"])
        arch = pipe.cldm._arch_kwargs(pipe.cldm.unet_cfg)
        out["unet"] = C.convert_ldm_unet({k[len("unet."):]: v for k, v in sd.items() if k.startswith("unet.")}, **arch)
        out["controlnet"] = C.convert_controlnet(
            {k[len("controlnet."):]: v for k, v in sd.items() if k.startswith("controlnet.")},
            **pipe.cldm._arch_kwargs(pipe.cldm.controlnet_cfg),
        )
        dd = pipe.cldm.vae.ddconfig or {}
        out["vae"] = C.convert_autoencoder_kl(
            {k[len("vae."):]: v for k, v in sd.items() if k.startswith("vae.")},
            ch=dd.get("ch", 128), ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
        )
        n_layers = pipe.cldm.clip.layers - (1 if pipe.cldm.clip.penultimate else 0)
        out["clip"] = C.convert_clip_text(
            {k[len("clip."):]: v for k, v in sd.items() if k.startswith("clip.")},
            prefix="model", layers=n_layers,
        )
    if "decoder" in obj and "vae" in out:
        dec = C.torch_state_dict_to_numpy(obj["decoder"])
        dd = pipe.cldm.vae.ddconfig or {}
        out["vae"]["decoder"] = C.convert_vae_decoder(
            dec, prefix="", ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
        )
    if "detnet" in obj:
        out["detnet_torch_sd"] = C.torch_state_dict_to_numpy(obj["detnet"])
    return out
