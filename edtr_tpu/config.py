"""Config system: YAML + ``target:``/``params:`` dependency-injection registry.

Mirrors the reference's OmegaConf-based instantiation surface
(`utils/common.py:23-34` in /root/reference) so that reference YAML configs
run unmodified: ``target`` dotted paths like ``model.swinir.SwinIR`` are
remapped through :data:`REGISTRY` onto edtr_tpu constructors, while native
``edtr_tpu.*`` paths resolve by plain import.

Implemented on pyyaml (OmegaConf is not available in this environment) with a
tiny attribute-access wrapper that supports the subset of OmegaConf behaviour
the configs rely on: nested attribute access, ``None`` for ``~``, ``get()``
with defaults, and dict/list round-tripping.
"""

from __future__ import annotations

import importlib
from typing import Any, Dict, Iterator, Optional

import yaml


class Config:
    """Attribute-access view over a nested dict (OmegaConf-lite)."""

    def __init__(self, data: Optional[Dict[str, Any]] = None):
        object.__setattr__(self, "_data", dict(data or {}))

    # -- mapping protocol -------------------------------------------------
    def __getitem__(self, key: str) -> Any:
        return _wrap(self._data[key])

    def __setitem__(self, key: str, value: Any) -> None:
        self._data[key] = _unwrap(value)

    def __contains__(self, key: str) -> bool:
        return key in self._data

    def __iter__(self) -> Iterator[str]:
        return iter(self._data)

    def __len__(self) -> int:
        return len(self._data)

    def keys(self):
        return self._data.keys()

    def values(self):
        return [_wrap(v) for v in self._data.values()]

    def items(self):
        return [(k, _wrap(v)) for k, v in self._data.items()]

    def get(self, key: str, default: Any = None) -> Any:
        if key in self._data:
            return _wrap(self._data[key])
        return default

    # -- attribute protocol ------------------------------------------------
    def __getattr__(self, key: str) -> Any:
        if key.startswith("_"):
            raise AttributeError(key)
        try:
            return _wrap(self._data[key])
        except KeyError as e:
            raise AttributeError(f"config has no key {key!r}") from e

    def __setattr__(self, key: str, value: Any) -> None:
        self._data[key] = _unwrap(value)

    def to_dict(self) -> Dict[str, Any]:
        return dict(self._data)

    def __repr__(self) -> str:
        return f"Config({self._data!r})"


def _wrap(v: Any) -> Any:
    if isinstance(v, dict):
        return Config(v)
    return v


def _unwrap(v: Any) -> Any:
    if isinstance(v, Config):
        return v.to_dict()
    return v


def load_config(path: str) -> Config:
    with open(path, "r") as f:
        return Config(yaml.safe_load(f))


# ---------------------------------------------------------------------------
# Registry: reference dotted paths -> edtr_tpu dotted paths.
#
# Keeping the *reference* target strings valid means every YAML under
# /root/reference/configs (and our mirrored configs/) instantiates the
# TPU-native counterpart without edits.
# ---------------------------------------------------------------------------
REGISTRY: Dict[str, str] = {
    # diffusion-restoration core
    "model.cldm.ControlLDM": "edtr_tpu.models.cldm.ControlLDM",
    "model.gaussian_diffusion.Diffusion": "edtr_tpu.diffusion.schedule.create_diffusion",
    "model.vae.Encoder": "edtr_tpu.models.vae.create_encoder",
    # restoration networks
    "model.swinir.SwinIR": "edtr_tpu.models.swinir.SwinIR",
    "model.bsrnet.RRDBNet": "edtr_tpu.models.bsrnet.RRDBNet",
    "model.scunet.SCUNet": "edtr_tpu.models.scunet.SCUNet",
    "model.skunet.SKUNet": "edtr_tpu.models.skunet.SKUNet",
    "model.edsr.EDSR": "edtr_tpu.models.edsr.EDSR",
    # task networks
    "model.resnet.ResNet": "edtr_tpu.models.resnet.ResNet",
    "model.faster_rcnn.fasterrcnn_mobilenet_v3_large_fpn":
        "edtr_tpu.models.faster_rcnn.fasterrcnn_mobilenet_v3_large_fpn",
    "model.faster_rcnn.fasterrcnn_resnet50_fpn_v2":
        "edtr_tpu.models.faster_rcnn.fasterrcnn_resnet50_fpn_v2",
    "model.deeplabv3.deeplabv3_mobilenet_v3_large":
        "edtr_tpu.models.deeplabv3.deeplabv3_mobilenet_v3_large",
    "model.deeplabv3.deeplabv3_resnet50":
        "edtr_tpu.models.deeplabv3.deeplabv3_resnet50",
    # datasets
    "datasets.classification.DegradedClassificationDataset":
        "edtr_tpu.data.classification.DegradedClassificationDataset",
    "datasets.classification.PairedClassificationDataset":
        "edtr_tpu.data.classification.PairedClassificationDataset",
    "datasets.segmentation.DegradedSegmentationDataset":
        "edtr_tpu.data.segmentation.DegradedSegmentationDataset",
    "datasets.segmentation.PairedSegmentationDataset":
        "edtr_tpu.data.segmentation.PairedSegmentationDataset",
    "datasets.detection.DegradedDetectionDataset":
        "edtr_tpu.data.detection.DegradedDetectionDataset",
    "datasets.detection.PairedDetectionDataset":
        "edtr_tpu.data.detection.PairedDetectionDataset",
    "datasets.detection.RealworldDetectionDataset":
        "edtr_tpu.data.detection.RealworldDetectionDataset",
    "datasets.detection_coco.DegradedDetectionDatasetCoco":
        "edtr_tpu.data.detection_coco.DegradedDetectionDatasetCoco",
    "datasets.detection_coco.PairedDetectionDatasetCoco":
        "edtr_tpu.data.detection_coco.PairedDetectionDatasetCoco",
    "datasets.detection_cocov2.DegradedDetectionDatasetCocov2":
        "edtr_tpu.data.detection_cocov2.DegradedDetectionDatasetCocov2",
    "datasets.detection_cocov2.RealESRGANBatchTransform":
        "edtr_tpu.data.realesrgan.RealESRGANBatchTransform",
    "datasets.file_backend.HardDiskBackend":
        "edtr_tpu.data.file_backend.HardDiskBackend",
}


def get_obj_from_str(string: str, reload: bool = False) -> Any:
    """Resolve a dotted path to an object, remapping reference paths.

    Parity: ``utils/common.py:23-28`` (reference).
    """
    string = REGISTRY.get(string, string)
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


def instantiate_from_config(config: Any, **extra_kwargs: Any) -> Any:
    """Build the object named by ``config.target`` with ``config.params``.

    Parity: ``utils/common.py:31-34`` (reference).
    """
    if isinstance(config, Config):
        config = config.to_dict()
    if "target" not in config:
        raise KeyError("Expected key `target` to instantiate.")
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return get_obj_from_str(config["target"])(**params)
