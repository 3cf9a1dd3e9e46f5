"""MobileNetV3-Large backbone (NHWC, flax).

TPU-native re-design of ``model/mobilenetv3.py`` (/root/reference — vendored
torchvision):

  InvertedResidualConfig / InvertedResidual -> model/mobilenetv3.py:21-110
  MobileNetV3                                -> model/mobilenetv3.py:113-219
  _mobilenet_v3_conf (large)                 -> model/mobilenetv3.py:222-246

``__call__(x, train)`` returns logits; ``features=True`` returns the list of
all 17 stage outputs (first conv + 15 blocks + last conv) so the detection
FPN extractor and the DeepLabV3 C-taps can index stages exactly like the
reference's ``IntermediateLayerGetter`` / ``stage_indices`` logic
(``model/deeplabv3.py:185-201``, ``model/faster_rcnn.py:647-694``).

BatchNorm: eps 1e-3, torch momentum 0.01 (flax momentum 0.99).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class IRConf(NamedTuple):
    in_ch: int
    kernel: int
    exp_ch: int
    out_ch: int
    use_se: bool
    use_hs: bool
    stride: int
    dilation: int

    @property
    def is_cn(self) -> bool:
        return self.stride > 1


def mobilenet_v3_large_conf(
    width_mult: float = 1.0, reduced_tail: bool = False, dilated: bool = False
) -> Tuple[List[IRConf], int]:
    """Table config; parity ``model/mobilenetv3.py:222-246``."""
    rd = 2 if reduced_tail else 1
    dil = 2 if dilated else 1
    a = lambda c: _make_divisible(c * width_mult)

    def c(i, k, e, o, se, act, s, d):
        return IRConf(a(i), k, a(e), a(o), se, act == "HS", s, d)

    setting = [
        c(16, 3, 16, 16, False, "RE", 1, 1),
        c(16, 3, 64, 24, False, "RE", 2, 1),      # C1
        c(24, 3, 72, 24, False, "RE", 1, 1),
        c(24, 5, 72, 40, True, "RE", 2, 1),       # C2
        c(40, 5, 120, 40, True, "RE", 1, 1),
        c(40, 5, 120, 40, True, "RE", 1, 1),
        c(40, 3, 240, 80, False, "HS", 2, 1),     # C3
        c(80, 3, 200, 80, False, "HS", 1, 1),
        c(80, 3, 184, 80, False, "HS", 1, 1),
        c(80, 3, 184, 80, False, "HS", 1, 1),
        c(80, 3, 480, 112, True, "HS", 1, 1),
        c(112, 3, 672, 112, True, "HS", 1, 1),
        c(112, 5, 672, 160 // rd, True, "HS", 2, dil),   # C4
        c(160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil),
        c(160 // rd, 5, 960 // rd, 160 // rd, True, "HS", 1, dil),
    ]
    last_channel = a(1280 // rd)
    return setting, last_channel


def _bn(name: str, train: bool):
    # torchvision mobilenet_v3 norm: BatchNorm2d(eps=1e-3, momentum=0.01)
    from edtr_tpu.models.layers import TorchBatchNorm

    return TorchBatchNorm(
        use_running_average=not train, momentum=0.01, epsilon=1e-3,
        dtype=jnp.float32, name=name,
    )


class ConvBNAct(nn.Module):
    """Conv2dNormActivation (``model/util.py:394``): conv (no bias) + BN + act."""

    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    act: Optional[str] = "relu"  # relu | hardswish | None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = (self.kernel - 1) // 2 * self.dilation
        x = nn.Conv(
            self.features, (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_dilation=(self.dilation, self.dilation),
            feature_group_count=self.groups,
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
            name="conv",
        )(x)
        x = _bn("bn", train)(x)
        if self.act == "relu":
            x = jax.nn.relu(x)
        elif self.act == "hardswish":
            x = jax.nn.hard_swish(x)
        return x


class SqueezeExcitation(nn.Module):
    """SE layer (``model/util.py:444``): avgpool->fc1->relu->fc2->hardsigmoid."""

    squeeze_ch: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(self.squeeze_ch, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32, name="fc2")(s)
        return x * jax.nn.hard_sigmoid(s)


class InvertedResidual(nn.Module):
    cnf: IRConf
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        cnf = self.cnf
        act = "hardswish" if cnf.use_hs else "relu"
        res = x
        i = 0
        if cnf.exp_ch != cnf.in_ch:
            x = ConvBNAct(cnf.exp_ch, 1, act=act, dtype=self.dtype,
                          name=f"block_{i}")(x, train)
            i += 1
        stride = 1 if cnf.dilation > 1 else cnf.stride
        x = ConvBNAct(
            cnf.exp_ch, cnf.kernel, stride=stride, dilation=cnf.dilation,
            groups=cnf.exp_ch, act=act, dtype=self.dtype, name=f"block_{i}",
        )(x, train)
        i += 1
        if cnf.use_se:
            x = SqueezeExcitation(
                _make_divisible(cnf.exp_ch // 4), dtype=self.dtype,
                name=f"block_{i}",
            )(x)
            i += 1
        x = ConvBNAct(cnf.out_ch, 1, act=None, dtype=self.dtype,
                      name=f"block_{i}")(x, train)
        if cnf.stride == 1 and cnf.in_ch == cnf.out_ch:
            x = x + res
        return x


class MobileNetV3(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    reduced_tail: bool = False
    dilated: bool = False
    dropout: float = 0.2
    dtype: Optional[Dtype] = None

    def stage_config(self):
        return mobilenet_v3_large_conf(self.width_mult, self.reduced_tail, self.dilated)

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = False, features: bool = False
    ):
        setting, last_channel = self.stage_config()
        feats: List[jnp.ndarray] = []
        x = x.astype(self.dtype or x.dtype)
        x = ConvBNAct(setting[0].in_ch, 3, stride=2, act="hardswish",
                      dtype=self.dtype, name="features_0")(x, train)
        feats.append(x)
        for bi, cnf in enumerate(setting):
            x = InvertedResidual(cnf, dtype=self.dtype, name=f"features_{bi + 1}")(x, train)
            feats.append(x)
        x = ConvBNAct(6 * setting[-1].out_ch, 1, act="hardswish",
                      dtype=self.dtype, name=f"features_{len(setting) + 1}")(x, train)
        feats.append(x)
        if features:
            return feats
        x = x.mean(axis=(1, 2))
        x = nn.Dense(last_channel, dtype=self.dtype, param_dtype=jnp.float32,
                     name="classifier_0")(x)
        x = jax.nn.hard_swish(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, param_dtype=jnp.float32,
                     name="classifier_3")(x)
        return x.astype(jnp.float32)

    def stage_indices(self) -> List[int]:
        """[0] + strided blocks + [last], in `feats` indexing.

        Parity: ``model/deeplabv3.py:185`` / ``model/faster_rcnn.py:656``.
        """
        setting, _ = self.stage_config()
        idx = [0] + [i + 1 for i, c in enumerate(setting) if c.is_cn] + [len(setting) + 1]
        return idx

    def stage_channels(self) -> List[int]:
        setting, _ = self.stage_config()
        chans = [setting[0].in_ch] + [c.out_ch for c in setting] + [6 * setting[-1].out_ch]
        return chans


def mobilenet_v3_large(
    weights_backbone=None, num_classes: int = 1000, dilated: bool = False,
    reduced_tail: bool = False, dtype=None, **kwargs,
) -> MobileNetV3:
    """Factory; ``weights_backbone`` is resolved by the checkpoint loader."""
    return MobileNetV3(
        num_classes=num_classes, dilated=dilated, reduced_tail=reduced_tail,
        dtype=dtype,
    )
