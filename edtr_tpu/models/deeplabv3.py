"""DeepLabV3 semantic segmentation (NHWC, flax).

TPU-native re-design of ``model/deeplabv3.py`` (/root/reference — vendored
torchvision):

  ASPP / ASPPConv / ASPPPooling -> model/deeplabv3.py:106-161
  DeepLabHead / FCNHead         -> model/deeplabv3.py:80-103
  _SimpleSegmentationModel      -> model/deeplabv3.py:25-58 (C5 head, C2 aux,
                                   ImageNet normalize, bilinear to input size)
  deeplabv3_mobilenet_v3_large  -> model/deeplabv3.py:362-403 (dilated
                                   backbone, taps at stage_indices[-1]/[-4])
  deeplabv3_resnet50            -> model/deeplabv3.py:260 (layer4/layer3 taps,
                                   replace_stride_with_dilation=[F,T,T])

``__call__(x, normalize=, return_feat=, train=)`` returns a dict with
``out`` (+``aux``) logits at input resolution, mirroring the reference's
OrderedDict contract; ``return_feat`` additionally returns the C-tap dict.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.mobilenetv3 import ConvBNAct, MobileNetV3
from edtr_tpu.models.resnet import ResNet, normalize_imagenet

Dtype = Any


class ASPP(nn.Module):
    atrous_rates: Sequence[int] = (12, 24, 36)
    out_channels: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        res = [
            ConvBNAct(self.out_channels, 1, act="relu", dtype=self.dtype,
                      name="convs_0")(x, train)
        ]
        for i, rate in enumerate(self.atrous_rates):
            res.append(
                ConvBNAct(self.out_channels, 3, dilation=rate, act="relu",
                          dtype=self.dtype, name=f"convs_{i + 1}")(x, train)
            )
        # ASPPPooling: global pool -> 1x1 conv/bn/relu -> broadcast back
        p = x.mean(axis=(1, 2), keepdims=True)
        p = ConvBNAct(self.out_channels, 1, act="relu", dtype=self.dtype,
                      name=f"convs_{len(self.atrous_rates) + 1}")(p, train)
        p = jnp.broadcast_to(p, x.shape[:3] + (self.out_channels,))
        res.append(p)
        y = jnp.concatenate(res, axis=-1)
        return ConvBNAct(self.out_channels, 1, act="relu", dtype=self.dtype,
                         name="project")(y, train)


class DeepLabHead(nn.Module):
    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        x = ASPP(dtype=self.dtype, name="aspp")(x, train)
        x = ConvBNAct(256, 3, act="relu", dtype=self.dtype, name="head")(x, train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="out")(x)


class FCNHead(nn.Module):
    num_classes: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        inter = x.shape[-1] // 4
        x = ConvBNAct(inter, 3, act="relu", dtype=self.dtype, name="head")(x, train)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32, name="out")(x)


class DeepLabV3MobileNet(nn.Module):
    num_classes: int = 21
    aux_loss: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        normalize: bool = True,
        return_feat: bool = False,
        train: bool = False,
    ):
        if normalize:
            x = normalize_imagenet(x)
        in_h, in_w = x.shape[1], x.shape[2]

        backbone = MobileNetV3(dilated=True, dtype=self.dtype, name="backbone")
        feats = backbone(x, train=train, features=True)
        si = backbone.stage_indices()
        features: Dict[str, jnp.ndarray] = {
            f"C{i}": feats[si[i]] for i in range(len(si))
        }

        out = DeepLabHead(self.num_classes, dtype=self.dtype, name="classifier")(
            features["C5"], train
        )
        out = jax.image.resize(
            out.astype(jnp.float32), (out.shape[0], in_h, in_w, out.shape[-1]), "bilinear"
        )
        result = {"out": out}
        if self.aux_loss:
            aux = FCNHead(self.num_classes, dtype=self.dtype, name="aux_classifier")(
                features["C2"], train
            )
            aux = jax.image.resize(
                aux.astype(jnp.float32), (aux.shape[0], in_h, in_w, aux.shape[-1]), "bilinear"
            )
            result["aux"] = aux
        if return_feat:
            return result, features
        return result


class DeepLabV3ResNet(nn.Module):
    num_classes: int = 21
    resnet_type: int = 50
    aux_loss: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        normalize: bool = True,
        return_feat: bool = False,
        train: bool = False,
    ):
        if normalize:
            x = normalize_imagenet(x)
        in_h, in_w = x.shape[1], x.shape[2]

        # output_stride 8: dilate layers 3 & 4 (torchvision deeplab resnet)
        backbone = ResNet(
            type=self.resnet_type,
            replace_stride_with_dilation=(False, True, True),
            dtype=self.dtype,
            name="backbone",
        )
        stages = backbone(x, normalize=False, features=True, train=train)
        feat = stages[-1]      # layer4 -> "C5" (model/deeplabv3.py:168)
        aux_feat = stages[-2]  # layer3 -> "C2" tap (model/deeplabv3.py:171)
        result = {}
        out = DeepLabHead(self.num_classes, dtype=self.dtype, name="classifier")(
            feat, train
        )
        out = jax.image.resize(
            out.astype(jnp.float32), (out.shape[0], in_h, in_w, out.shape[-1]), "bilinear"
        )
        result["out"] = out
        if self.aux_loss:
            aux = FCNHead(self.num_classes, dtype=self.dtype, name="aux_classifier")(
                aux_feat, train
            )
            result["aux"] = jax.image.resize(
                aux.astype(jnp.float32), (aux.shape[0], in_h, in_w, aux.shape[-1]),
                "bilinear",
            )
        if return_feat:
            return result, {"C5": feat, "C2": aux_feat}
        return result


def deeplabv3_mobilenet_v3_large(
    weights_backbone=None, num_classes: int = 21, aux_loss: bool = True,
    dtype=None, **kwargs,
) -> DeepLabV3MobileNet:
    return DeepLabV3MobileNet(num_classes=num_classes, aux_loss=aux_loss, dtype=dtype)


def deeplabv3_resnet50(
    weights_backbone=None, num_classes: int = 21, aux_loss: bool = False,
    dtype=None, **kwargs,
) -> DeepLabV3ResNet:
    return DeepLabV3ResNet(num_classes=num_classes, resnet_type=50,
                           aux_loss=aux_loss, dtype=dtype)
