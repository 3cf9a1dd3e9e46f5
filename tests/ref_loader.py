"""Import individual reference modules from /root/reference as golden oracles.

The reference package __init__ pulls in torchvision/timm (absent here), so we
register a synthetic ``model``/``utils``/``datasets`` package whose __path__
points at the reference tree WITHOUT executing its __init__, and stub the
missing third-party surface that vendored files import but our golden tests
never exercise.

This file ships no reference code — it only loads the read-only reference at
test time to produce golden activations.
"""

import sys
import types

REF = "/root/reference"


def _stub_torchvision():
    if "torchvision" in sys.modules:
        return
    import torch

    tv = types.ModuleType("torchvision")
    transforms_mod = types.ModuleType("torchvision.transforms")

    class _Normalize:
        def __init__(self, mean, std, inplace=False):
            self.mean, self.std = mean, std

        def __call__(self, x):
            mean = torch.tensor(self.mean, dtype=x.dtype).view(-1, 1, 1)
            std = torch.tensor(self.std, dtype=x.dtype).view(-1, 1, 1)
            return (x - mean) / std

    inner = types.ModuleType("torchvision.transforms.transforms")
    inner.Normalize = _Normalize
    transforms_mod.transforms = inner
    transforms_mod.Normalize = _Normalize
    tv.transforms = transforms_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.transforms.transforms"] = inner


def _stub_timm():
    if "timm" in sys.modules:
        return
    import math

    import torch
    import torch.nn as nn

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        # standard truncated-normal init (timm semantics)
        def norm_cdf(x):
            return (1.0 + math.erf(x / math.sqrt(2.0))) / 2.0

        with torch.no_grad():
            l = norm_cdf((a - mean) / std)
            u = norm_cdf((b - mean) / std)
            tensor.uniform_(2 * l - 1, 2 * u - 1)
            tensor.erfinv_()
            tensor.mul_(std * math.sqrt(2.0))
            tensor.add_(mean)
            tensor.clamp_(min=a, max=b)
            return tensor

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1 - self.drop_prob
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            mask = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * mask.floor_()

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    layers.trunc_normal_ = trunc_normal_
    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    models.layers = layers
    timm.models = models
    sys.modules["timm"] = timm
    sys.modules["timm.models"] = models
    sys.modules["timm.models.layers"] = layers


def _stub_ftfy():
    if "ftfy" in sys.modules:
        return
    ftfy = types.ModuleType("ftfy")
    ftfy.fix_text = lambda s: s
    sys.modules["ftfy"] = ftfy



def _stub_torchvision_ops():
    """torchvision.ops surface used by the vendored faster_rcnn at import /
    construction time. FeaturePyramidNetwork is a real (param-bearing) torch
    module so state_dict keys match torchvision's layout."""
    import sys as _sys

    if "torchvision.ops" in _sys.modules:
        return
    import torch
    import torch.nn as nn

    ops = types.ModuleType("torchvision.ops")
    fpn_mod = types.ModuleType("torchvision.ops.feature_pyramid_network")

    class ExtraFPNBlock(nn.Module):
        pass

    class LastLevelMaxPool(ExtraFPNBlock):
        def forward(self, results, x, names):
            names.append("pool")
            results.append(torch.nn.functional.max_pool2d(results[-1], 1, 2, 0))
            return results, names

    class FeaturePyramidNetwork(nn.Module):
        def __init__(self, in_channels_list, out_channels, extra_blocks=None,
                     norm_layer=None):
            super().__init__()
            self.inner_blocks = nn.ModuleList()
            self.layer_blocks = nn.ModuleList()
            for in_ch in in_channels_list:
                self.inner_blocks.append(
                    nn.Sequential(nn.Conv2d(in_ch, out_channels, 1)))
                self.layer_blocks.append(
                    nn.Sequential(nn.Conv2d(out_channels, out_channels, 3, padding=1)))
            self.extra_blocks = extra_blocks

    class MultiScaleRoIAlign(nn.Module):
        def __init__(self, featmap_names, output_size, sampling_ratio, **kw):
            super().__init__()
            self.featmap_names = featmap_names
            self.output_size = (
                (output_size, output_size) if isinstance(output_size, int)
                else output_size
            )
            self.sampling_ratio = sampling_ratio

    def _unavailable(*a, **k):
        raise NotImplementedError("torchvision.ops stub: runtime op not available")

    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    for name in ("nms", "batched_nms", "box_iou", "clip_boxes_to_image",
                 "remove_small_boxes", "box_area"):
        setattr(boxes_mod, name, _unavailable)

    fpn_mod.ExtraFPNBlock = ExtraFPNBlock
    fpn_mod.FeaturePyramidNetwork = FeaturePyramidNetwork
    fpn_mod.LastLevelMaxPool = LastLevelMaxPool
    ops.boxes = boxes_mod
    ops.roi_align = _unavailable
    ops.MultiScaleRoIAlign = MultiScaleRoIAlign
    ops.feature_pyramid_network = fpn_mod
    _sys.modules["torchvision.ops"] = ops
    _sys.modules["torchvision.ops.boxes"] = boxes_mod
    _sys.modules["torchvision.ops.feature_pyramid_network"] = fpn_mod
    _sys.modules["torchvision"].ops = ops


def _stub_omegaconf():
    if "omegaconf" in sys.modules:
        return
    oc = types.ModuleType("omegaconf")
    lc = types.ModuleType("omegaconf.listconfig")

    class ListConfig(list):
        pass

    lc.ListConfig = ListConfig
    oc.listconfig = lc
    oc.ListConfig = ListConfig
    sys.modules["omegaconf"] = oc
    sys.modules["omegaconf.listconfig"] = lc


def _synthetic_pkg(name, path):
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg
    return pkg


def load_ref_module(dotted: str):
    """Import e.g. 'model.unet' from the reference tree, bypassing __init__."""
    _stub_torchvision()
    _stub_torchvision_ops()
    _stub_timm()
    _stub_omegaconf()
    _stub_ftfy()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    top = dotted.split(".")[0]
    _synthetic_pkg(top, f"{REF}/{top}")
    # some reference modules do `from model import ControlLDM` only for typing
    sys.modules[top].ControlLDM = object
    import importlib

    return importlib.import_module(dotted)
