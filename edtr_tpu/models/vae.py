"""SD KL-VAE (AutoencoderKL) — NHWC flax re-design.

Parity map against /root/reference/model/vae.py:
  ResnetBlock   -> model/vae.py:64-125 (no temb: temb_channels=0 in configs)
  AttnBlock     -> model/vae.py:127-323 (single-head spatial attention; the
                   vanilla/xformers/sdp variants are one op here)
  Downsample    -> model/vae.py:42-61 (asymmetric (0,1,0,1) pad, stride-2)
  Upsample      -> model/vae.py:26-39 (nearest 2x + conv)
  Encoder       -> model/vae.py:326-446
  Decoder       -> model/vae.py:449-560
  AutoencoderKL -> model/vae.py:681-743 (quant/post_quant 1x1 convs,
                   DiagonalGaussianDistribution posterior; train_decoder flag
                   is a *trainability* property handled by the optimizer
                   partition, not the module)

The dead ``Unraveler`` class (model/vae.py:563-678) is unreachable from any
config and is intentionally not ported (SURVEY.md §7 non-goals).

GroupNorms use eps=1e-6 (``Normalize``, model/vae.py:22-23) and compute in
fp32. The mid-attention runs through ``edtr_tpu.ops.attention`` so it picks
up the Pallas flash kernel on TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.distributions import DiagonalGaussianDistribution
from edtr_tpu.models.layers import (ConvParams, GroupNorm32, conv,
                                    nearest_upsample_2x, silu)
from edtr_tpu.ops import gn_conv
from edtr_tpu.ops.attention import dot_product_attention

Dtype = Any


class ResnetBlock(nn.Module):
    """VAE resblock (``model/vae.py:38-85``, dropout=0 in every config).

    ``fused=True`` (default) routes both GN+SiLU+conv3x3 halves through
    ``ops/gn_conv.py`` with the skip add fused into the second conv's
    epilogue. ``GroupNorm32(fold=True)`` keeps the ``gn_stats`` sow and
    ``gn_moments`` injection, so the tiled-VAE GroupNorm sync
    (utils/tiling.py) is unchanged: global moments fold into the same
    per-(B, C) affine the kernel applies. Falls back to exact XLA
    reference math on CPU/unsupported shapes; ``fused=False`` preserves
    the legacy module path for equality tests (identical param tree).
    """

    out_channels: int
    dtype: Optional[Dtype] = None
    fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        if self.fused:
            xc = x.astype(self.dtype or x.dtype)
            mul1, add1 = GroupNorm32(epsilon=1e-6, fold=True,
                                     name="norm1")(xc)
            w1, b1 = ConvParams(3, 3, in_ch, self.out_channels,
                                name="conv1")()
            h = gn_conv.gn_silu_conv(xc, mul1, add1, w1, b1, None, None)
            mul2, add2 = GroupNorm32(epsilon=1e-6, fold=True,
                                     name="norm2")(h)
            w2, b2 = ConvParams(3, 3, self.out_channels, self.out_channels,
                                name="conv2")()
            skip = x
            if in_ch != self.out_channels:
                skip = conv(self.out_channels, 1, dtype=self.dtype,
                            name="nin_shortcut")(x)
            return gn_conv.gn_silu_conv(h, mul2, add2, w2, b2, None,
                                        skip.astype(h.dtype))
        h = GroupNorm32(epsilon=1e-6, name="norm1")(x)
        h = silu(h)
        h = conv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm2")(h)
        h = silu(h)
        h = conv(self.out_channels, 3, padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, 1, dtype=self.dtype, name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over HW tokens."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        y = GroupNorm32(epsilon=1e-6, name="norm")(x)
        q = conv(c, 1, dtype=self.dtype, name="q")(y).reshape(b, h * w, 1, c)
        k = conv(c, 1, dtype=self.dtype, name="k")(y).reshape(b, h * w, 1, c)
        v = conv(c, 1, dtype=self.dtype, name="v")(y).reshape(b, h * w, 1, c)
        out = dot_product_attention(q, k, v, scale=c ** -0.5)
        out = out.reshape(b, h, w, c)
        out = conv(c, 1, dtype=self.dtype, name="proj_out")(out)
        return x + out


class Downsample(nn.Module):
    """Stride-2 conv with the SD VAE's asymmetric (0,1,0,1) zero pad."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return conv(c, 3, stride=2, padding=0, dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + conv; the 2x tensor never touches HBM
    (ops/gn_conv.py:upsample_conv; XLA reference fallback inside)."""

    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        w, b = ConvParams(3, 3, c, c, name="conv")()
        return gn_conv.upsample_conv(x.astype(self.dtype or x.dtype), w, b,
                                     None, "vae")


class Encoder(nn.Module):
    ch: int = 128
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    z_channels: int = 4
    double_z: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype or x.dtype)
        h = conv(self.ch, 3, padding=1, dtype=self.dtype, name="conv_in")(x)
        for i_level, mult in enumerate(self.ch_mult):
            block_out = self.ch * mult
            for i_block in range(self.num_res_blocks):
                h = ResnetBlock(
                    out_channels=block_out,
                    dtype=self.dtype,
                    name=f"down_{i_level}_block_{i_block}",
                )(h)
            if i_level != len(self.ch_mult) - 1:
                h = Downsample(dtype=self.dtype, name=f"down_{i_level}_downsample")(h)
        h = ResnetBlock(out_channels=h.shape[-1], dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = ResnetBlock(out_channels=h.shape[-1], dtype=self.dtype, name="mid_block_2")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = silu(h)
        out_ch = 2 * self.z_channels if self.double_z else self.z_channels
        return conv(out_ch, 3, padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    ch: int = 128
    out_ch: int = 3
    ch_mult: Sequence[int] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    # rematerialize resblocks in the backward pass (TPU training aid — the
    # EDTR recipe backprops through the decoder at 512², which OOMs 16 GB
    # HBM without remat; no reference counterpart, default off)
    use_checkpoint: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        from edtr_tpu.models.layers import remat

        RB = remat(ResnetBlock) if self.use_checkpoint else ResnetBlock
        z = z.astype(self.dtype or z.dtype)
        block_in = self.ch * self.ch_mult[-1]
        h = conv(block_in, 3, padding=1, dtype=self.dtype, name="conv_in")(z)
        h = RB(out_channels=block_in, dtype=self.dtype, name="mid_block_1")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn_1")(h)
        h = RB(out_channels=block_in, dtype=self.dtype, name="mid_block_2")(h)
        for i_level in reversed(range(len(self.ch_mult))):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                h = RB(
                    out_channels=block_out,
                    dtype=self.dtype,
                    name=f"up_{i_level}_block_{i_block}",
                )(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
        h = GroupNorm32(epsilon=1e-6, name="norm_out")(h)
        h = silu(h)
        return conv(self.out_ch, 3, padding=1, dtype=self.dtype, name="conv_out")(h).astype(
            jnp.float32
        )


class AutoencoderKL(nn.Module):
    """KL-VAE bundle: encoder + quant convs + decoder."""

    ddconfig: Any = None
    embed_dim: int = 4
    train_decoder: bool = False  # trainability flag consumed by the optimizer
    dtype: Optional[Dtype] = None

    def setup(self):
        dd = dict(self.ddconfig or {})
        self.encoder = Encoder(
            ch=dd.get("ch", 128),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            z_channels=dd.get("z_channels", 4),
            double_z=dd.get("double_z", True),
            dtype=self.dtype,
        )
        self.decoder = Decoder(
            ch=dd.get("ch", 128),
            out_ch=dd.get("out_ch", 3),
            ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
            num_res_blocks=dd.get("num_res_blocks", 2),
            use_checkpoint=dd.get("use_checkpoint", False),
            dtype=self.dtype,
        )
        z = dd.get("z_channels", 4)
        self.quant_conv = conv(2 * self.embed_dim if dd.get("double_z", True) else self.embed_dim,
                               1, dtype=self.dtype, name="quant_conv")
        self.post_quant_conv = conv(z, 1, dtype=self.dtype, name="post_quant_conv")

    def encode(self, x: jnp.ndarray) -> DiagonalGaussianDistribution:
        h = self.encoder(x)
        moments = self.quant_conv(h).astype(jnp.float32)
        return DiagonalGaussianDistribution(moments)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(
        self, x: jnp.ndarray, rng: Optional[jax.Array] = None, sample_posterior: bool = True
    ) -> Tuple[jnp.ndarray, DiagonalGaussianDistribution]:
        posterior = self.encode(x)
        z = posterior.sample(rng) if sample_posterior else posterior.mode()
        return self.decode(z), posterior


def create_encoder(**kwargs) -> Encoder:
    """Config-registry factory for ``target: model.vae.Encoder`` (the dead
    ``nsampler`` node in cls test configs, configs/cls/cub200/test/00*_edtr-*.yaml)
    — tolerates the reference's extra ddconfig-style keys."""
    fields = {"ch", "ch_mult", "num_res_blocks", "z_channels", "double_z", "dtype"}
    kw = {k: v for k, v in kwargs.items() if k in fields}
    if "ch_mult" in kw and isinstance(kw["ch_mult"], list):
        kw["ch_mult"] = tuple(kw["ch_mult"])
    return Encoder(**kw)
