"""Differentiable JPEG codec in pure jnp (batched, NHWC).

TPU re-design of ``datasets/diffjpeg.py`` (/root/reference, 492 LoC): the
standard DiffJPEG stages — RGB->YCbCr, 2x2 chroma subsampling, 8x8 block
DCT, luminance/chrominance quantization tables scaled by the quality factor,
(optionally hard) rounding, and the full inverse. Pads inputs to multiples of
16 like the reference (``DiffJPEG.forward``, datasets/diffjpeg.py:450-492).

Everything is tensor math -> maps 1:1 onto XLA (SURVEY.md §7 step 3); the
whole codec jits into one fused kernel and runs on-device inside the
RealESRGAN batch transform. Per-sample ``quality`` is a traced vector.
"""

from __future__ import annotations

import itertools
from functools import lru_cache
from typing import Union

import jax.numpy as jnp
import numpy as np

# standard JPEG quantization tables
Y_TABLE = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32).T  # transposed: DCT output is (u, v) with u on rows
# (matches the reference's y_table.T, datasets/diffjpeg.py:15-24)

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([
    [17, 18, 24, 47],
    [18, 21, 26, 66],
    [24, 26, 56, 99],
    [47, 66, 99, 99],
], dtype=np.float32)
C_TABLE = C_TABLE.T


@lru_cache()
def _dct_tensor():
    t = np.zeros((8, 8, 8, 8), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        t[x, y, u, v] = np.cos((2 * x + 1) * u * np.pi / 16) * np.cos(
            (2 * y + 1) * v * np.pi / 16
        )
    alpha = np.array([1.0 / np.sqrt(2)] + [1] * 7, dtype=np.float32)
    scale = np.outer(alpha, alpha) * 0.25
    return t, scale


def quality_to_factor(quality: Union[float, jnp.ndarray]) -> jnp.ndarray:
    """Standard IJG quality -> scale factor."""
    quality = jnp.asarray(quality, jnp.float32)
    factor = jnp.where(quality < 50, 5000.0 / quality, 200.0 - quality * 2) / 100.0
    # quality == 100 -> factor 0 -> div-by-zero in quantization; clamp
    return jnp.maximum(factor, 1.0 / 255.0)


def rgb_to_ycbcr(x: jnp.ndarray) -> jnp.ndarray:
    """x (.., 3) in [0,255] -> YCbCr with +128 chroma offset (JPEG convention)."""
    m = jnp.array(
        [
            [0.299, 0.587, 0.114],
            [-0.168736, -0.331264, 0.5],
            [0.5, -0.418688, -0.081312],
        ],
        jnp.float32,
    ).T
    out = x @ m + jnp.array([0.0, 128.0, 128.0], jnp.float32)
    return out


def ycbcr_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    m = jnp.array(
        [[1.0, 0.0, 1.402], [1.0, -0.344136, -0.714136], [1.0, 1.772, 0.0]],
        jnp.float32,
    ).T
    return (x - jnp.array([0.0, 128.0, 128.0], jnp.float32)) @ m


def _blockify(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) -> (B, H/8 * W/8, 8, 8)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, -1, 8, 8)


def _unblockify(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    x = x.transpose(0, 1, 3, 2, 4)
    return x.reshape(b, h, w)


def block_dct(blocks: jnp.ndarray) -> jnp.ndarray:
    t, scale = _dct_tensor()
    x = blocks - 128.0
    out = jnp.tensordot(x, jnp.asarray(t), axes=([-2, -1], [0, 1]))
    return out * jnp.asarray(scale)


def block_idct(coefs: jnp.ndarray) -> jnp.ndarray:
    # type-III DCT: f(x,y) = 1/4 sum_uv a(u)a(v) F(u,v) cos(..u..) cos(..v..)
    t, scale = _dct_tensor()
    alpha2 = jnp.asarray(scale) * 4.0  # outer(alpha, alpha)
    out = 0.25 * jnp.tensordot(coefs * alpha2, jnp.asarray(t), axes=([-2, -1], [2, 3]))
    return out + 128.0


def _quantize(coefs, table, factor, differentiable):
    q = jnp.asarray(table)[None, None] * factor[:, None, None, None]
    scaled = coefs / q
    if differentiable:
        # cubic soft-round; parity ``diff_round`` (datasets/diffjpeg.py:27-30)
        rounded = jnp.round(scaled) + (scaled - jnp.round(scaled)) ** 3
    else:
        rounded = jnp.round(scaled)
    return rounded * q


def _avg_pool_2x2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))


def _upsample_2x2(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w = x.shape
    return jnp.broadcast_to(x[:, :, None, :, None], (b, h, 2, w, 2)).reshape(
        b, h * 2, w * 2
    )


def diff_jpeg(
    x: jnp.ndarray,
    quality: Union[float, jnp.ndarray] = 75,
    differentiable: bool = False,
) -> jnp.ndarray:
    """JPEG round-trip of an NHWC [0,1] batch; per-sample ``quality``.

    Parity: ``DiffJPEG.forward`` (datasets/diffjpeg.py:450-492) — pad to x16,
    encode+decode, crop back.
    """
    b, h, w, c = x.shape
    assert c == 3
    factor = jnp.broadcast_to(quality_to_factor(quality), (b,))

    ph = (16 - h % 16) % 16
    pw = (16 - w % 16) % 16
    xp = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    hh, ww = h + ph, w + pw

    ycc = rgb_to_ycbcr(xp * 255.0)
    y, cb, cr = ycc[..., 0], ycc[..., 1], ycc[..., 2]
    cb, cr = _avg_pool_2x2(cb), _avg_pool_2x2(cr)

    comps = {}
    for name, comp, table in (("y", y, Y_TABLE), ("cb", cb, C_TABLE), ("cr", cr, C_TABLE)):
        blocks = _blockify(comp)
        coefs = block_dct(blocks)
        deq = _quantize(coefs, table, factor, differentiable)
        rec = block_idct(deq)
        ch, cw = comp.shape[1], comp.shape[2]
        comps[name] = _unblockify(rec, ch, cw)

    cb_up, cr_up = _upsample_2x2(comps["cb"]), _upsample_2x2(comps["cr"])
    ycc_rec = jnp.stack([comps["y"], cb_up, cr_up], axis=-1)
    rgb = ycbcr_to_rgb(ycc_rec) / 255.0
    rgb = jnp.clip(rgb, 0.0, 1.0)
    return rgb[:, :h, :w, :]


class DiffJPEG:
    """Class shim matching the reference call surface (``jpeger(x, quality=q)``)."""

    def __init__(self, differentiable: bool = False):
        self.differentiable = differentiable

    def __call__(self, x: jnp.ndarray, quality=75) -> jnp.ndarray:
        return diff_jpeg(x, quality, self.differentiable)
