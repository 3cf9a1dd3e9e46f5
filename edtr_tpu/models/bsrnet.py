"""RRDBNet (ESRGAN/BSRGAN-style SR network), NHWC flax.

Parity: ``model/bsrnet.py:36-113`` (/root/reference). Exported by the
reference's ``model/__init__.py:13`` but unused by any config (SURVEY.md
§2.2) — implemented for inventory completeness.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.layers import conv, nearest_upsample_2x
from edtr_tpu.models.swinir import pixel_unshuffle

Dtype = Any


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.2)


class ResidualDenseBlock5C(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x1 = _lrelu(conv(self.gc, 3, padding=1, dtype=self.dtype, name="conv1")(x))
        x2 = _lrelu(conv(self.gc, 3, padding=1, dtype=self.dtype, name="conv2")(
            jnp.concatenate([x, x1], -1)))
        x3 = _lrelu(conv(self.gc, 3, padding=1, dtype=self.dtype, name="conv3")(
            jnp.concatenate([x, x1, x2], -1)))
        x4 = _lrelu(conv(self.gc, 3, padding=1, dtype=self.dtype, name="conv4")(
            jnp.concatenate([x, x1, x2, x3], -1)))
        x5 = conv(self.nf, 3, padding=1, dtype=self.dtype, name="conv5")(
            jnp.concatenate([x, x1, x2, x3, x4], -1))
        return x5 * 0.2 + x


class RRDB(nn.Module):
    nf: int = 64
    gc: int = 32
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB1")(x)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB2")(out)
        out = ResidualDenseBlock5C(self.nf, self.gc, self.dtype, name="RDB3")(out)
        return out * 0.2 + x


class RRDBNet(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 23
    gc: int = 32
    sf: int = 4
    unshuffle: bool = False
    unshuffle_scale: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.unshuffle:
            x = pixel_unshuffle(x, self.unshuffle_scale)
            fea = conv(self.nf, 3, padding=1, dtype=self.dtype, name="conv_first_1")(x)
        else:
            fea = conv(self.nf, 3, padding=1, dtype=self.dtype, name="conv_first")(x)
        trunk = fea
        for i in range(self.nb):
            trunk = RRDB(self.nf, self.gc, self.dtype, name=f"RRDB_trunk_{i}")(trunk)
        trunk = conv(self.nf, 3, padding=1, dtype=self.dtype, name="trunk_conv")(trunk)
        fea = fea + trunk
        fea = _lrelu(conv(self.nf, 3, padding=1, dtype=self.dtype, name="upconv1")(
            nearest_upsample_2x(fea)))
        if self.sf == 4:
            fea = _lrelu(conv(self.nf, 3, padding=1, dtype=self.dtype, name="upconv2")(
                nearest_upsample_2x(fea)))
        out = conv(self.out_nc, 3, padding=1, dtype=self.dtype, name="conv_last")(
            _lrelu(conv(self.nf, 3, padding=1, dtype=self.dtype, name="HRconv")(fea)))
        return out
