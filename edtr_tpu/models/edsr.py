"""EDSR super-resolution network, NHWC flax.

Parity: ``model/edsr.py:79-151`` (/root/reference). Not exported or used by
any reference config (SURVEY.md §2.2) — implemented for completeness.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.layers import conv
from edtr_tpu.models.swinir import pixel_shuffle, pixel_unshuffle

Dtype = Any

DIV2K_RGB_MEAN = (0.4488, 0.4371, 0.4040)


class EDSRResBlock(nn.Module):
    n_feats: int
    res_scale: float = 1.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = conv(self.n_feats, 3, padding=1, dtype=self.dtype, name="conv1")(x)
        h = jax.nn.relu(h)
        h = conv(self.n_feats, 3, padding=1, dtype=self.dtype, name="conv2")(h)
        return x + h * self.res_scale


class EDSR(nn.Module):
    in_nc: int = 3
    out_nc: int = 3
    n_resblocks: int = 32
    n_feats: int = 256
    scale: int = 4
    rgb_range: float = 1.0
    res_scale: float = 1.0
    unshuffle: bool = False
    unshuffle_scale: Optional[int] = None
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.asarray(DIV2K_RGB_MEAN, x.dtype) * self.rgb_range
        x = x - mean
        if self.unshuffle:
            x = pixel_unshuffle(x, self.unshuffle_scale)
        x = conv(self.n_feats, 3, padding=1, dtype=self.dtype, name="head")(x)
        res = x
        for i in range(self.n_resblocks):
            res = EDSRResBlock(self.n_feats, self.res_scale, self.dtype,
                               name=f"body_{i}")(res)
        res = conv(self.n_feats, 3, padding=1, dtype=self.dtype, name="body_conv")(res)
        x = x + res
        # tail: pixel-shuffle upsampler (scale 2^n or 3)
        s = self.scale
        i = 0
        while s % 2 == 0 and s > 1:
            x = conv(self.n_feats * 4, 3, padding=1, dtype=self.dtype, name=f"up_{i}")(x)
            x = pixel_shuffle(x, 2)
            s //= 2
            i += 1
        if s == 3:
            x = conv(self.n_feats * 9, 3, padding=1, dtype=self.dtype, name=f"up_{i}")(x)
            x = pixel_shuffle(x, 3)
        x = conv(self.out_nc, 3, padding=1, dtype=self.dtype, name="tail")(x)
        return x + mean
