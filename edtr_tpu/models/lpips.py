"""LPIPS perceptual metric (Zhang et al. 2018), TPU-native.

The reference wraps the ``lpips`` pip package through
``calculate_lpips_pt`` (``utils/common.py:252-269``). That package is not
installed here, so this module implements the published LPIPS graph in
flax — an AlexNet or VGG16 feature tower, per-tap unit normalization,
squared differences, learned non-negative 1x1 "lin" heads, spatial mean,
sum over taps — plus a converter for the official ``lpips`` package
checkpoints (``convert_lpips`` in ``edtr_tpu/utils/convert.py``). The
pretrained weights are NOT bundled; point ``$EDTR_LPIPS_WEIGHTS`` at a
``lpips`` state dict (e.g. from ``lpips.LPIPS(net='alex')``) to enable
``edtr_tpu.utils.image.calculate_lpips``.

Inputs follow the package convention: NHWC images in [-1, 1].
"""

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# the lpips package's fixed input scaling layer (ImageNet stats on [-1,1])
_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)


def _conv(ch: int, k: int, stride: int = 1, pad: int = 0, name: str = ""):
    return nn.Conv(
        ch, (k, k), strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)], param_dtype=jnp.float32, name=name,
    )


class AlexTower(nn.Module):
    """torchvision AlexNet ``features`` sliced at each ReLU (lpips slices
    1-5): conv11/4/p2 -> [pool] conv5/p2 -> [pool] conv3 -> conv3 -> conv3."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        taps = []
        x = jax.nn.relu(_conv(64, 11, 4, 2, "conv0")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jax.nn.relu(_conv(192, 5, 1, 2, "conv1")(x))
        taps.append(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        x = jax.nn.relu(_conv(384, 3, 1, 1, "conv2")(x))
        taps.append(x)
        x = jax.nn.relu(_conv(256, 3, 1, 1, "conv3")(x))
        taps.append(x)
        x = jax.nn.relu(_conv(256, 3, 1, 1, "conv4")(x))
        taps.append(x)
        return tuple(taps)


class VGG16Tower(nn.Module):
    """VGG16 features tapped at relu1_2/2_2/3_3/4_3/5_3 (lpips slices)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        taps = []
        ci = 0
        for bi, (ch, reps) in enumerate(cfg):
            for _ in range(reps):
                x = jax.nn.relu(_conv(ch, 3, 1, 1, f"conv{ci}")(x))
                ci += 1
            taps.append(x)
            if bi < len(cfg) - 1:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return tuple(taps)


class LPIPS(nn.Module):
    """Full LPIPS head: returns (B,) distances for NHWC [-1,1] inputs."""

    net: str = "alex"  # or "vgg"
    spatial: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT, x.dtype)
        scale = jnp.asarray(_SCALE, x.dtype)
        tower = (AlexTower if self.net == "alex" else VGG16Tower)(name="tower")
        fx = tower((x - shift) / scale)
        fy = tower((y - shift) / scale)

        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / jnp.sqrt(jnp.sum(a * a, -1, keepdims=True) + 1e-10)
            b = b / jnp.sqrt(jnp.sum(b * b, -1, keepdims=True) + 1e-10)
            d = (a - b) ** 2
            lin = nn.Conv(1, (1, 1), use_bias=False, param_dtype=jnp.float32,
                          name=f"lin{i}")(d)
            total = total + (lin if self.spatial else lin.mean(axis=(1, 2, 3)))
        return total


def load_lpips(path: str, net: str = "alex"):
    """(module, params) from an ``lpips`` package state dict on disk."""
    from edtr_tpu.utils.checkpoint import load_torch_state_dict
    from edtr_tpu.utils.convert import convert_lpips

    sd = load_torch_state_dict(path)
    module = LPIPS(net=net)
    return module, convert_lpips(sd, net=net)
