"""SCUNet — Swin-Conv UNet denoiser (NHWC, flax).

Parity: ``model/scunet.py:9-264`` (/root/reference). Exported by the
reference's ``model/__init__.py:14`` but unused by any config (SURVEY.md
§2.2) — implemented for inventory completeness.

The WMSA here differs from SwinIR's window attention: a per-head learnable
relative-embedding grid and boolean shift masks (scunet.py:33-51).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edtr_tpu.models.layers import LayerNorm, conv, dense

Dtype = Any


@lru_cache(maxsize=16)
def _rel_index(window_size: int) -> np.ndarray:
    cord = np.array([[i, j] for i in range(window_size) for j in range(window_size)])
    rel = cord[:, None, :] - cord[None, :, :] + window_size - 1  # (p, p, 2)
    return rel.astype(np.int32)


@lru_cache(maxsize=32)
def _shift_mask(h_windows: int, w_windows: int, p: int, shift: int) -> np.ndarray:
    """Boolean (nW, p², p²) mask (True = blocked); parity scunet.py:33-51."""
    m = np.zeros((h_windows, w_windows, p, p, p, p), bool)
    s = p - shift
    m[-1, :, :s, :, s:, :] = True
    m[-1, :, s:, :, :s, :] = True
    m[:, -1, :, :s, :, s:] = True
    m[:, -1, :, s:, :, :s] = True
    return m.reshape(h_windows * w_windows, p * p, p * p)


class WMSA(nn.Module):
    dim: int
    head_dim: int = 32
    window_size: int = 8
    shifted: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        p = self.window_size
        n_heads = self.dim // self.head_dim
        # reference Block.__init__ forces type='W' when the (static) feature
        # resolution is <= window_size (model/scunet.py:98-101)
        shifted = self.shifted and h > p
        if shifted:
            x = jnp.roll(x, (-(p // 2), -(p // 2)), axis=(1, 2))
        hw, ww = h // p, w // p
        xw = x.reshape(b, hw, p, ww, p, c).transpose(0, 1, 3, 2, 4, 5)
        xw = xw.reshape(b, hw * ww, p * p, c)
        qkv = dense(3 * self.dim, dtype=self.dtype, name="embedding_layer")(xw)
        qkv = qkv.reshape(b, hw * ww, p * p, 3, n_heads, self.head_dim)
        q, k, v = qkv[..., 0, :, :], qkv[..., 1, :, :], qkv[..., 2, :, :]
        sim = jnp.einsum("bwphc,bwqhc->bhwpq", q, k).astype(jnp.float32)
        sim = sim * (self.head_dim ** -0.5)

        table = self.param(
            "relative_position_params",
            nn.initializers.normal(0.02),
            (n_heads, 2 * p - 1, 2 * p - 1),
            jnp.float32,
        )
        rel = _rel_index(p)
        bias = table[:, rel[:, :, 0], rel[:, :, 1]]  # (H, p², p²)
        sim = sim + bias[None, :, None]
        if shifted:
            mask = jnp.asarray(_shift_mask(hw, ww, p, p // 2))
            sim = jnp.where(mask[None, None], -jnp.inf, sim)
        probs = jax.nn.softmax(sim, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhwpq,bwqhc->bwphc", probs, v)
        out = out.reshape(b, hw * ww, p * p, self.dim)
        out = dense(self.dim, dtype=self.dtype, name="linear")(out)
        out = out.reshape(b, hw, ww, p, p, self.dim).transpose(0, 1, 3, 2, 4, 5)
        out = out.reshape(b, h, w, self.dim)
        if shifted:
            out = jnp.roll(out, (p // 2, p // 2), axis=(1, 2))
        return out


class SwinBlock(nn.Module):
    dim: int
    head_dim: int = 32
    window_size: int = 8
    shifted: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + WMSA(self.dim, self.head_dim, self.window_size, self.shifted,
                     self.dtype, name="msa")(LayerNorm(name="ln1")(x))
        h = LayerNorm(name="ln2")(x)
        h = dense(4 * self.dim, dtype=self.dtype, name="mlp_0")(h)
        h = jax.nn.gelu(h, approximate=False)
        h = dense(self.dim, dtype=self.dtype, name="mlp_2")(h)
        return x + h


class ConvTransBlock(nn.Module):
    conv_dim: int
    trans_dim: int
    head_dim: int = 32
    window_size: int = 8
    shifted: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        y = conv(self.conv_dim + self.trans_dim, 1, dtype=self.dtype, name="conv1_1")(x)
        conv_x, trans_x = jnp.split(y, [self.conv_dim], axis=-1)
        h = conv(self.conv_dim, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="conv_block_0")(conv_x)
        h = jax.nn.relu(h)
        h = conv(self.conv_dim, 3, padding=1, use_bias=False, dtype=self.dtype,
                 name="conv_block_2")(h)
        conv_x = conv_x + h
        trans_x = SwinBlock(self.trans_dim, self.head_dim, self.window_size,
                            self.shifted, self.dtype, name="trans_block")(trans_x)
        res = conv(self.conv_dim + self.trans_dim, 1, dtype=self.dtype,
                   name="conv1_2")(jnp.concatenate([conv_x, trans_x], -1))
        return x + res


def _conv_transpose_2x(features, name, dtype=None):
    return nn.ConvTranspose(
        features, (2, 2), strides=(2, 2), use_bias=False,
        dtype=dtype, param_dtype=jnp.float32, name=name,
    )


class SCUNet(nn.Module):
    in_nc: int = 3
    config: Sequence[int] = (2, 2, 2, 2, 2, 2, 2)
    dim: int = 64
    drop_path_rate: float = 0.0
    input_resolution: int = 256
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x0: jnp.ndarray) -> jnp.ndarray:
        h, w = x0.shape[1], x0.shape[2]
        ph = (64 - h % 64) % 64
        pw = (64 - w % 64) % 64
        if ph or pw:
            x0 = jnp.pad(x0, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="edge")
        d = self.dim

        def stage(x, n, cdim, tdim, name, res):
            for i in range(n):
                x = ConvTransBlock(
                    cdim, tdim, 32, 8, shifted=bool(i % 2) and res > 8,
                    dtype=self.dtype, name=f"{name}_{i}",
                )(x)
            return x

        x1 = conv(d, 3, padding=1, use_bias=False, dtype=self.dtype, name="m_head")(x0)
        x = stage(x1, self.config[0], d // 2, d // 2, "m_down1", self.input_resolution)
        x2 = conv(2 * d, 2, stride=2, use_bias=False, dtype=self.dtype, name="m_down1_pool")(x)
        x = stage(x2, self.config[1], d, d, "m_down2", self.input_resolution // 2)
        x3 = conv(4 * d, 2, stride=2, use_bias=False, dtype=self.dtype, name="m_down2_pool")(x)
        x = stage(x3, self.config[2], 2 * d, 2 * d, "m_down3", self.input_resolution // 4)
        x4 = conv(8 * d, 2, stride=2, use_bias=False, dtype=self.dtype, name="m_down3_pool")(x)
        x = stage(x4, self.config[3], 4 * d, 4 * d, "m_body", self.input_resolution // 8)
        x = _conv_transpose_2x(4 * d, "m_up3_t", self.dtype)(x + x4)
        x = stage(x, self.config[4], 2 * d, 2 * d, "m_up3", self.input_resolution // 4)
        x = _conv_transpose_2x(2 * d, "m_up2_t", self.dtype)(x + x3)
        x = stage(x, self.config[5], d, d, "m_up2", self.input_resolution // 2)
        x = _conv_transpose_2x(d, "m_up1_t", self.dtype)(x + x2)
        x = stage(x, self.config[6], d // 2, d // 2, "m_up1", self.input_resolution)
        x = conv(self.in_nc, 3, padding=1, use_bias=False, dtype=self.dtype, name="m_tail")(x + x1)
        return x[:, :h, :w, :]
