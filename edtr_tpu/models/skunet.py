"""SKUNet — selective-kernel UNet restorer (NHWC, flax).

Parity: ``model/skunet.py:7-162`` (/root/reference). Exported by the
reference's ``model/__init__.py:15`` but unused by any config (SURVEY.md
§2.2) — implemented for inventory completeness.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.resnet import normalize_imagenet

Dtype = Any


def _adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """AdaptiveAvgPool2d((out, out)) for sizes divisible by out."""
    b, h, w, c = x.shape
    return x.reshape(b, out, h // out, out, w // out, c).mean(axis=(2, 4))


def _bilinear_2x_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """nn.Upsample(scale_factor=2, mode='bilinear', align_corners=True).

    jax.image.resize is half-pixel (align_corners=False), so interpolate on
    the corner-aligned grid explicitly (skunet.py:91 uses align_corners=True).
    """
    b, h, w, c = x.shape

    def axis_weights(n):
        s = jnp.linspace(0.0, n - 1.0, 2 * n)
        i0 = jnp.floor(s).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n - 1)
        return i0, i1, (s - i0).astype(x.dtype)

    y0, y1, wy = axis_weights(h)
    x0, x1, wx = axis_weights(w)
    top = x[:, y0][:, :, x0] * (1 - wx)[None, None, :, None] + \
        x[:, y0][:, :, x1] * wx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * (1 - wx)[None, None, :, None] + \
        x[:, y1][:, :, x1] * wx[None, None, :, None]
    return top * (1 - wy)[None, :, None, None] + bot * wy[None, :, None, None]


class Selector(nn.Module):
    """Spatial-attention selector; parity skunet.py:7-38."""

    channel: int
    reduction: int = 16
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, h, w, c = x.shape
        sa = 4
        y = _adaptive_avg_pool(x, sa).reshape(b, -1)
        in_ch = c * sa * sa
        y = nn.Dense(in_ch // self.reduction, use_bias=False, dtype=self.dtype,
                     param_dtype=jnp.float32, name="fc")(y)
        y = jax.nn.relu(y)
        a1 = nn.Dense(in_ch, dtype=self.dtype, param_dtype=jnp.float32,
                      name="att_conv1")(y).reshape(b, sa, sa, c)
        a2 = nn.Dense(in_ch, dtype=self.dtype, param_dtype=jnp.float32,
                      name="att_conv2")(y).reshape(b, sa, sa, c)
        att = jax.nn.softmax(jnp.stack([a1, a2]), axis=0)
        up = lambda a: jax.image.resize(a, (b, h, w, c), "nearest")
        return up(att[0]), up(att[1])


class SelectiveConv(nn.Module):
    """Dual-path (BN / IN) conv with learned spatial mixing; skunet.py:41-71."""

    out_channels: int
    kernel_size: int = 3
    reduction: int = 16
    first: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = self.kernel_size // 2
        if self.first:
            f_in = s_in = x
        else:
            f_in = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, param_dtype=jnp.float32, name="BN")(x)
            f_in = jax.nn.leaky_relu(f_in, 0.01)
            # InstanceNorm2d (no affine): per-sample per-channel spatial norm
            mean = x.mean(axis=(1, 2), keepdims=True)
            var = x.var(axis=(1, 2), keepdims=True)
            s_in = (x - mean) * jax.lax.rsqrt(var + 1e-5)
            s_in = jax.nn.leaky_relu(s_in, 0.01)
        mk = lambda name: nn.Conv(
            self.out_channels, (self.kernel_size,) * 2,
            padding=[(pad, pad)] * 2, use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        out1 = mk("conv1")(f_in)
        out2 = mk("conv2")(s_in)
        att1, att2 = Selector(self.out_channels, self.reduction, self.dtype,
                              name="selector")(out1 + out2)
        return out1 * att1 + out2 * att2


class SKUNet(nn.Module):
    bilinear: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, normalize: bool = True,
                 train: bool = False) -> jnp.ndarray:
        if normalize:
            x = normalize_imagenet(x)
        x_origin = x
        x1 = nn.Conv(32, (9, 9), padding=[(4, 4)] * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="down1")(x)
        # SKDown = maxpool(2) + SelectiveConv
        def down(v, out_ch, name):
            v = nn.max_pool(v, (2, 2), strides=(2, 2))
            return SelectiveConv(out_ch, 3, 16, dtype=self.dtype, name=name)(v, train)

        x2 = down(x1, 64, "down2")
        x3 = down(x2, 64, "down3")

        def up(v, skip, out_ch, name):
            v = _bilinear_2x_align_corners(v)
            v = jnp.concatenate([skip, v], axis=-1)
            return SelectiveConv(out_ch, 3, 16, dtype=self.dtype, name=name)(v, train)

        x = up(x3, x2, 32, "up1")
        x = up(x, x1, 16, "up2")
        x = nn.Conv(3, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                    param_dtype=jnp.float32, name="up3")(x)
        return x + x_origin
