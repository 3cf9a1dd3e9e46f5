"""ResNet classification network (NHWC, flax) with the EDTR extras.

TPU-native re-design of ``model/resnet.py`` (/root/reference — a vendored
torchvision ResNet):

* built-in ImageNet normalization (``Normalize``, model/resnet.py:16-32);
* ``__call__(x, upsample=, normalize=, return_feat=)`` returns
  ``(logits, layer4_feat)`` when ``return_feat`` (model/resnet.py:279-315);
* ``type`` int selects 18/34/50/101/152 (model/resnet.py:194-204);
* ``replace_stride_with_dilation`` supported for the DeepLabV3 backbone.

BatchNorm: torch defaults (eps 1e-5, torch-momentum 0.1 == flax momentum
0.9); running stats live in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)

ARCHS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


def normalize_imagenet(x: jnp.ndarray, inv: bool = False) -> jnp.ndarray:
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    if inv:
        return x * std + mean
    return (x - mean) / std


def _bn(name: str, train: bool):
    # torch nn.BatchNorm2d defaults (eps 1e-5, torch momentum 0.1) with exact
    # train-mode semantics incl. the unbiased running-var update
    from edtr_tpu.models.layers import TorchBatchNorm

    return TorchBatchNorm(
        use_running_average=not train,
        momentum=0.1,
        epsilon=1e-5,
        dtype=jnp.float32,
        name=name,
    )


def _conv(features, k, stride=1, dilation=1, name=None, dtype=None):
    pad = dilation * (k - 1) // 2
    return nn.Conv(
        features, (k, k), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        kernel_dilation=(dilation, dilation),
        use_bias=False, dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        identity = x
        out = _conv(self.planes, 3, self.stride, self.dilation, "conv1", self.dtype)(x)
        out = _bn("bn1", train)(out)
        out = jax.nn.relu(out)
        out = _conv(self.planes, 3, 1, self.dilation, "conv2", self.dtype)(out)
        out = _bn("bn2", train)(out)
        if self.has_downsample:
            identity = _conv(self.planes, 1, self.stride, 1, "downsample_0", self.dtype)(x)
            identity = _bn("downsample_1", train)(identity)
        return jax.nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dilation: int = 1
    has_downsample: bool = False
    base_width: int = 64
    dtype: Optional[Dtype] = None
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        width = int(self.planes * (self.base_width / 64.0))
        identity = x
        out = _conv(width, 1, 1, 1, "conv1", self.dtype)(x)
        out = _bn("bn1", train)(out)
        out = jax.nn.relu(out)
        # torchvision v1.5: stride on the 3x3
        out = _conv(width, 3, self.stride, self.dilation, "conv2", self.dtype)(out)
        out = _bn("bn2", train)(out)
        out = jax.nn.relu(out)
        out = _conv(self.planes * self.expansion, 1, 1, 1, "conv3", self.dtype)(out)
        out = _bn("bn3", train)(out)
        if self.has_downsample:
            identity = _conv(self.planes * self.expansion, 1, self.stride, 1, "downsample_0", self.dtype)(x)
            identity = _bn("downsample_1", train)(identity)
        return jax.nn.relu(out + identity)


class ResNet(nn.Module):
    type: int = 18
    num_classes: int = 1000
    inp_chans: int = 3
    strides: Sequence[int] = (2, 2, 2)
    replace_stride_with_dilation: Sequence[bool] = (False, False, False)
    resize: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        upsample: int = 1,
        normalize: bool = True,
        return_feat: bool = False,
        features: bool = False,
        train: bool = False,
    ):
        """``features=True`` returns the [layer1..layer4] stage outputs
        (C2..C5) for FPN/DeepLab backbones."""
        block_kind, layers = ARCHS[self.type]
        Block = BasicBlock if block_kind == "basic" else Bottleneck
        expansion = 1 if block_kind == "basic" else 4

        if self.resize:
            x = jax.image.resize(x, (x.shape[0], 224, 224, x.shape[-1]), "bilinear")
        if upsample > 1:
            x = jax.image.resize(
                x,
                (x.shape[0], x.shape[1] * upsample, x.shape[2] * upsample, x.shape[-1]),
                "bilinear",
            )
        if normalize:
            x = normalize_imagenet(x)
        x = x.astype(self.dtype or x.dtype)

        x = _conv(64, 7, 2, 1, "conv1", self.dtype)(x)
        x = _bn("bn1", train)(x)
        x = jax.nn.relu(x)
        # torch MaxPool2d(3, 2, padding=1): pad with -inf then VALID max
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # torchvision _make_layer: first block of a dilated stage keeps the
        # previous dilation and drops its stride; later blocks use the new one
        inplanes = 64
        dilation = 1
        stage_outputs = []
        for li, (planes_mult, n_blocks) in enumerate(zip((1, 2, 4, 8), layers)):
            planes = 64 * planes_mult
            stride = 1 if li == 0 else self.strides[li - 1]
            dilate = False if li == 0 else self.replace_stride_with_dilation[li - 1]
            prev_dilation = dilation
            if dilate:
                dilation *= stride
                stride = 1
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                d = prev_dilation if bi == 0 else dilation
                has_ds = bi == 0 and (stride != 1 or inplanes != planes * expansion)
                x = Block(
                    planes=planes,
                    stride=s,
                    dilation=d,
                    has_downsample=has_ds,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train=train)
                inplanes = planes * expansion
            stage_outputs.append(x)
        feat = x
        if features:
            return stage_outputs

        x = x.mean(axis=(1, 2))  # AdaptiveAvgPool2d(1)
        x = nn.Dense(self.num_classes, param_dtype=jnp.float32, dtype=self.dtype, name="fc")(x)
        x = x.astype(jnp.float32)
        if return_feat:
            return x, feat
        return x
