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
    tv._is_tracing = lambda: False

    # utils/common.py imports these two at module scope; the golden paths we
    # exercise (SpacedSampler, wavelet, make_tiled_fn) never call them.
    functional_mod = types.ModuleType("torchvision.transforms.functional")

    def _tv_normalize(tensor, mean, std, inplace=False):
        mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
        std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
        return (tensor - mean) / std

    functional_mod.normalize = _tv_normalize
    transforms_mod.functional = functional_mod
    models_mod = types.ModuleType("torchvision.models")

    def _get_model(name, **kw):
        raise RuntimeError(
            "torchvision.models.get_model is stubbed (no pretrained zoo in "
            "this environment)")

    models_mod.get_model = _get_model
    tv.models = models_mod
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = transforms_mod
    sys.modules["torchvision.transforms.transforms"] = inner
    sys.modules["torchvision.transforms.functional"] = functional_mod
    sys.modules["torchvision.models"] = models_mod


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
    """torchvision.ops surface used by the vendored faster_rcnn.

    Full pure-torch implementations (standard published semantics of
    nms/roi_align/MultiScaleRoIAlign/FeaturePyramidNetwork) so the reference
    detector runs END-TO-END on CPU as a golden oracle — torchvision itself
    is absent in this image.
    """
    import sys as _sys

    if "torchvision.ops" in _sys.modules:
        return
    import math as _math
    from collections import OrderedDict

    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    ops = types.ModuleType("torchvision.ops")
    fpn_mod = types.ModuleType("torchvision.ops.feature_pyramid_network")

    # ---- boxes ------------------------------------------------------------
    def box_area(b):
        return (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])

    def box_iou(a, b):
        area1, area2 = box_area(a), box_area(b)
        lt = torch.max(a[:, None, :2], b[:, :2])
        rb = torch.min(a[:, None, 2:], b[:, 2:])
        wh = (rb - lt).clamp(min=0)
        inter = wh[:, :, 0] * wh[:, :, 1]
        return inter / (area1[:, None] + area2 - inter)

    def clip_boxes_to_image(boxes, size):
        h, w = size
        x = boxes[..., 0::2].clamp(min=0, max=w)
        y = boxes[..., 1::2].clamp(min=0, max=h)
        out = boxes.clone()
        out[..., 0::2] = x
        out[..., 1::2] = y
        return out

    def remove_small_boxes(boxes, min_size):
        ws = boxes[:, 2] - boxes[:, 0]
        hs = boxes[:, 3] - boxes[:, 1]
        keep = (ws >= min_size) & (hs >= min_size)
        return torch.where(keep)[0]

    def nms(boxes, scores, iou_threshold):
        order = torch.argsort(scores, descending=True, stable=True)
        suppressed = torch.zeros(boxes.shape[0], dtype=torch.bool)
        keep = []
        for i in order.tolist():
            if suppressed[i]:
                continue
            keep.append(i)
            ious = box_iou(boxes[i][None], boxes)[0]
            suppressed |= ious > iou_threshold
        return torch.as_tensor(keep, dtype=torch.int64)

    def batched_nms(boxes, scores, idxs, iou_threshold):
        if boxes.numel() == 0:
            return torch.empty((0,), dtype=torch.int64)
        max_coordinate = boxes.max()
        offsets = idxs.to(boxes) * (max_coordinate + 1)
        return nms(boxes + offsets[:, None], scores, iou_threshold)

    # ---- roi_align ----------------------------------------------------------
    def _bilinear(feat, ys, xs):
        # feat (C, H, W); ys/xs (P,) -> (C, P); torchvision border semantics
        C, H, W = feat.shape
        outside = (ys < -1.0) | (ys > float(H)) | (xs < -1.0) | (xs > float(W))
        ys = ys.clamp(0.0, H - 1.0)
        xs = xs.clamp(0.0, W - 1.0)
        y0 = ys.floor().long()
        x0 = xs.floor().long()
        y1 = (y0 + 1).clamp(max=H - 1)
        x1 = (x0 + 1).clamp(max=W - 1)
        ly, lx = ys - y0, xs - x0
        hy, hx = 1.0 - ly, 1.0 - lx
        v = (feat[:, y0, x0] * (hy * hx) + feat[:, y0, x1] * (hy * lx)
             + feat[:, y1, x0] * (ly * hx) + feat[:, y1, x1] * (ly * lx))
        return torch.where(outside[None, :], torch.zeros_like(v), v)

    def roi_align(input, boxes, output_size, spatial_scale=1.0,
                  sampling_ratio=-1, aligned=False):
        if isinstance(boxes, (list, tuple)):
            rois = torch.cat([
                torch.cat([torch.full((b.shape[0], 1), i, dtype=b.dtype), b], 1)
                for i, b in enumerate(boxes)
            ])
        else:
            rois = boxes
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        ph, pw = output_size
        n, C, H, W = input.shape
        K = rois.shape[0]
        out = input.new_zeros((K, C, ph, pw))
        if K == 0:
            return out
        assert sampling_ratio > 0, "oracle roi_align: fixed sampling_ratio only"
        sr = sampling_ratio
        offset = 0.5 if aligned else 0.0
        b = rois[:, 1:] * spatial_scale - offset
        x1, y1 = b[:, 0], b[:, 1]
        roi_w, roi_h = b[:, 2] - x1, b[:, 3] - y1
        if not aligned:
            roi_w = roi_w.clamp(min=1.0)
            roi_h = roi_h.clamp(min=1.0)
        bin_w, bin_h = roi_w / pw, roi_h / ph
        grid = (torch.arange(ph, dtype=torch.float64).repeat_interleave(sr)
                + ((torch.arange(sr, dtype=torch.float64) + 0.5) / sr).repeat(ph)).float()
        for bi in range(n):
            sel = torch.where(rois[:, 0] == bi)[0]
            if sel.numel() == 0:
                continue
            ys = y1[sel, None] + grid[None, :] * bin_h[sel, None]  # (k, ph*sr)
            xs = x1[sel, None] + grid[None, :] * bin_w[sel, None]
            k = sel.numel()
            yy = ys[:, :, None].expand(k, ph * sr, pw * sr).reshape(-1)
            xx = xs[:, None, :].expand(k, ph * sr, pw * sr).reshape(-1)
            v = _bilinear(input[bi], yy, xx)  # (C, k*ph*sr*pw*sr)
            v = v.reshape(C, k, ph, sr, pw, sr).mean(dim=(3, 5))
            out[sel] = v.permute(1, 0, 2, 3)
        return out

    # ---- FPN ---------------------------------------------------------------
    class ExtraFPNBlock(nn.Module):
        pass

    class LastLevelMaxPool(ExtraFPNBlock):
        def forward(self, results, x, names):
            names.append("pool")
            results.append(F.max_pool2d(results[-1], 1, 2, 0))
            return results, names

    class FeaturePyramidNetwork(nn.Module):
        def __init__(self, in_channels_list, out_channels, extra_blocks=None,
                     norm_layer=None):
            super().__init__()
            self.inner_blocks = nn.ModuleList()
            self.layer_blocks = nn.ModuleList()
            for in_ch in in_channels_list:
                if norm_layer is None:
                    self.inner_blocks.append(
                        nn.Sequential(nn.Conv2d(in_ch, out_channels, 1)))
                    self.layer_blocks.append(
                        nn.Sequential(nn.Conv2d(out_channels, out_channels, 3, padding=1)))
                else:
                    self.inner_blocks.append(nn.Sequential(
                        nn.Conv2d(in_ch, out_channels, 1, bias=False),
                        norm_layer(out_channels)))
                    self.layer_blocks.append(nn.Sequential(
                        nn.Conv2d(out_channels, out_channels, 3, padding=1, bias=False),
                        norm_layer(out_channels)))
            self.extra_blocks = extra_blocks

        def forward(self, x):
            names = list(x.keys())
            feats = list(x.values())
            last_inner = self.inner_blocks[-1](feats[-1])
            results = [self.layer_blocks[-1](last_inner)]
            for idx in range(len(feats) - 2, -1, -1):
                inner_lateral = self.inner_blocks[idx](feats[idx])
                top_down = F.interpolate(last_inner, size=inner_lateral.shape[-2:],
                                         mode="nearest")
                last_inner = inner_lateral + top_down
                results.insert(0, self.layer_blocks[idx](last_inner))
            if self.extra_blocks is not None:
                results, names = self.extra_blocks(results, feats, names)
            return OrderedDict(zip(names, results))

    # ---- MultiScaleRoIAlign --------------------------------------------------
    class MultiScaleRoIAlign(nn.Module):
        def __init__(self, featmap_names, output_size, sampling_ratio,
                     canonical_scale=224, canonical_level=4, **kw):
            super().__init__()
            self.featmap_names = featmap_names
            self.output_size = (
                (output_size, output_size) if isinstance(output_size, int)
                else output_size
            )
            self.sampling_ratio = sampling_ratio
            self.canonical_scale = canonical_scale
            self.canonical_level = canonical_level

        def forward(self, x, boxes, image_shapes):
            x_filtered = [v for k, v in x.items() if k in self.featmap_names]
            max_h = max(s[0] for s in image_shapes)
            max_w = max(s[1] for s in image_shapes)

            def infer_scale(feat):
                size = feat.shape[-2:]
                s = []
                for s1, s2 in zip(size, (max_h, max_w)):
                    s.append(2.0 ** float(
                        torch.tensor(s1 / s2, dtype=torch.float64).log2().round()))
                assert s[0] == s[1]
                return s[0]

            scales = [infer_scale(f) for f in x_filtered]
            lvl_min = -_math.log2(scales[0])
            lvl_max = -_math.log2(scales[-1])

            rois = torch.cat([
                torch.cat([torch.full((b.shape[0], 1), i, dtype=b.dtype), b], 1)
                for i, b in enumerate(boxes)
            ])
            concat_boxes = torch.cat(boxes, dim=0)
            s = torch.sqrt(box_area(concat_boxes))
            target = torch.floor(
                self.canonical_level
                + torch.log2(s / self.canonical_scale + 1e-6))
            levels = (target.clamp(min=lvl_min, max=lvl_max) - lvl_min).long()

            K = rois.shape[0]
            C = x_filtered[0].shape[1]
            ph, pw = self.output_size
            out = x_filtered[0].new_zeros((K, C, ph, pw))
            for lvl, (feat, scale) in enumerate(zip(x_filtered, scales)):
                idx = torch.where(levels == lvl)[0]
                if idx.numel():
                    out[idx] = roi_align(feat, rois[idx], self.output_size,
                                         scale, self.sampling_ratio)
            return out

    boxes_mod = types.ModuleType("torchvision.ops.boxes")
    boxes_mod.nms = nms
    boxes_mod.batched_nms = batched_nms
    boxes_mod.box_iou = box_iou
    boxes_mod.clip_boxes_to_image = clip_boxes_to_image
    boxes_mod.remove_small_boxes = remove_small_boxes
    boxes_mod.box_area = box_area

    fpn_mod.ExtraFPNBlock = ExtraFPNBlock
    fpn_mod.FeaturePyramidNetwork = FeaturePyramidNetwork
    fpn_mod.LastLevelMaxPool = LastLevelMaxPool
    ops.boxes = boxes_mod
    ops.nms = nms
    ops.batched_nms = batched_nms
    ops.box_iou = box_iou
    ops.roi_align = roi_align
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
