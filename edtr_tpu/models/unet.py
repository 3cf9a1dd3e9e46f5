"""SD2.1 LDM UNet (NHWC, flax) with ControlNet residual injection.

TPU-native re-design of ``model/unet.py:361-719`` and
``model/controlnet.py:18-41`` (/root/reference):

* functional flax modules; the torch ``TimestepEmbedSequential`` dispatch
  becomes explicit Python composition at trace time;
* NHWC layout: skip-connections concatenate on the channel (lane) axis;
* gradient checkpointing (`use_checkpoint`, reference ``model/util.py:35-95``)
  becomes ``nn.remat`` over ResBlock/SpatialTransformer — XLA rematerializes
  activations instead of torch's custom autograd.Function;
* compute dtype is configurable (bf16 on TPU); GroupNorms and the timestep
  MLP accumulate in fp32.

Only the config knobs exercised by the EDTR configs are implemented
(SURVEY.md §2.1): scale-shift-norm / resblock-updown / legacy AttentionBlock
paths are intentionally absent (no config enables them).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.attention import SpatialTransformer
from edtr_tpu.models.layers import (
    ConvParams,
    GroupNorm32,
    avg_pool_2x,
    conv,
    dense,
    nearest_upsample_2x,
    remat,
    silu,
    timestep_embedding,
)
from edtr_tpu.ops import gn_conv

Dtype = Any


class ResBlock(nn.Module):
    """LDM ResBlock, ``use_scale_shift_norm=False`` variant.

    Parity: ``model/unet.py:110-223`` (in_layers/emb_layers/out_layers/skip).

    ``fused=True`` (default) routes both GN+SiLU+conv3x3 halves through
    ``ops/gn_conv.py`` — GroupNorm stats fold in XLA, the normalized
    activation stays in VMEM, and the emb/skip adds fuse into the conv
    epilogues. Param tree and math are identical to the legacy module path
    (which ``fused=False`` preserves for equality tests); the op falls back
    to exact XLA reference math on CPU/unsupported shapes.
    """

    out_channels: int
    dtype: Optional[Dtype] = None
    fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        if self.fused:
            xc = x.astype(self.dtype or x.dtype)
            mul1, add1 = GroupNorm32(fold=True, name="in_norm")(xc)
            w1, b1 = ConvParams(3, 3, in_ch, self.out_channels,
                                name="in_conv")()
            emb_out = dense(self.out_channels, dtype=self.dtype,
                            name="emb_proj")(silu(emb))
            h = gn_conv.gn_silu_conv(xc, mul1, add1, w1, b1, emb_out, None)
            mul2, add2 = GroupNorm32(fold=True, name="out_norm")(h)
            w2, b2 = ConvParams(3, 3, self.out_channels, self.out_channels,
                                zero=True, name="out_conv")()
            skip = x
            if in_ch != self.out_channels:
                skip = conv(self.out_channels, 1, dtype=self.dtype,
                            name="skip")(x)
            return gn_conv.gn_silu_conv(h, mul2, add2, w2, b2, None,
                                        skip.astype(h.dtype))
        h = GroupNorm32(name="in_norm")(x)
        h = silu(h)
        h = conv(self.out_channels, 3, padding=1, dtype=self.dtype, name="in_conv")(h)
        emb_out = dense(self.out_channels, dtype=self.dtype, name="emb_proj")(silu(emb))
        h = h + emb_out[:, None, None, :].astype(h.dtype)
        h = GroupNorm32(name="out_norm")(h)
        h = silu(h)
        h = conv(self.out_channels, 3, padding=1, zero=True, dtype=self.dtype, name="out_conv")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, 1, dtype=self.dtype, name="skip")(x)
        return x + h


class Downsample(nn.Module):
    """Stride-2 conv downsample (``conv_resample=True``); ``model/unet.py:82-108``."""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            return conv(
                self.out_channels, 3, stride=2, padding=1, dtype=self.dtype, name="op"
            )(x)
        return avg_pool_2x(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (``conv_resample=True``); ``model/unet.py:50-79``.

    The conv consumes the 2x tensor straight from VMEM
    (ops/gn_conv.py:upsample_conv; XLA reference fallback inside)."""

    out_channels: int
    use_conv: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.use_conv:
            w, b = ConvParams(3, 3, x.shape[-1], self.out_channels,
                              name="conv")()
            return gn_conv.upsample_conv(
                x.astype(self.dtype or x.dtype), w, b, None, "unet")
        return nearest_upsample_2x(x)


def _heads_for(ch: int, num_head_channels: int, num_heads: int) -> Tuple[int, int]:
    if num_head_channels == -1:
        return num_heads, ch // num_heads
    return ch // num_head_channels, num_head_channels


class UNetModel(nn.Module):
    """SD2.1 UNet; ``control`` enables the ControlledUnetModel behaviour.

    Parity: ``UNetModel`` ``model/unet.py:361-719`` and
    ``ControlledUnetModel.forward`` ``model/controlnet.py:18-41``: control is
    a tuple of 13 residuals — [0..11] added to the stored encoder skips,
    [12] added to the middle block output.
    """

    in_channels: int = 4
    model_channels: int = 320
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4, 4)
    num_heads: int = -1
    num_head_channels: int = 64
    transformer_depth: int = 1
    context_dim: Optional[int] = 1024
    use_linear_in_transformer: bool = True
    use_checkpoint: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        control: Optional[Sequence[jnp.ndarray]] = None,
        only_mid_control: bool = False,
    ) -> jnp.ndarray:
        Res = remat(ResBlock) if self.use_checkpoint else ResBlock
        ST = remat(SpatialTransformer, static_argnums=()) if self.use_checkpoint else SpatialTransformer
        mc = self.model_channels

        t_emb = timestep_embedding(timesteps, mc)
        emb = dense(mc * 4, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = dense(mc * 4, dtype=self.dtype, name="time_embed_2")(silu(emb))

        x = x.astype(self.dtype or x.dtype)
        if context is not None:
            context = context.astype(self.dtype or context.dtype)

        # --- encoder -------------------------------------------------------
        hs = []
        h = conv(mc, 3, padding=1, dtype=self.dtype, name="input_blocks_0_0")(x)
        hs.append(h)
        blk = 1
        ch = mc
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                ch = mult * mc
                h = Res(out_channels=ch, dtype=self.dtype, name=f"input_blocks_{blk}_0")(h, emb)
                if ds in self.attention_resolutions:
                    n_heads, d_head = _heads_for(ch, self.num_head_channels, self.num_heads)
                    h = ST(
                        in_channels=ch,
                        n_heads=n_heads,
                        d_head=d_head,
                        depth=self.transformer_depth,
                        context_dim=self.context_dim,
                        use_linear=self.use_linear_in_transformer,
                        dtype=self.dtype,
                        name=f"input_blocks_{blk}_1",
                    )(h, context)
                hs.append(h)
                blk += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(out_channels=ch, dtype=self.dtype, name=f"input_blocks_{blk}_0")(h)
                hs.append(h)
                blk += 1
                ds *= 2

        # --- middle --------------------------------------------------------
        n_heads, d_head = _heads_for(ch, self.num_head_channels, self.num_heads)
        h = Res(out_channels=ch, dtype=self.dtype, name="middle_block_0")(h, emb)
        h = ST(
            in_channels=ch,
            n_heads=n_heads,
            d_head=d_head,
            depth=self.transformer_depth,
            context_dim=self.context_dim,
            use_linear=self.use_linear_in_transformer,
            dtype=self.dtype,
            name="middle_block_1",
        )(h, context)
        h = Res(out_channels=ch, dtype=self.dtype, name="middle_block_2")(h, emb)

        control_list = list(control) if control is not None else None
        if control_list is not None:
            h = h + control_list.pop().astype(h.dtype)

        # --- decoder ---------------------------------------------------------
        blk = 0
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            for i in range(self.num_res_blocks + 1):
                skip = hs.pop()
                if control_list is not None and not only_mid_control:
                    skip = skip + control_list.pop().astype(h.dtype)
                h = jnp.concatenate([h, skip], axis=-1)
                ch = mult * mc
                h = Res(out_channels=ch, dtype=self.dtype, name=f"output_blocks_{blk}_0")(h, emb)
                sub = 1
                if (2 ** level) in self.attention_resolutions:
                    n_heads, d_head = _heads_for(ch, self.num_head_channels, self.num_heads)
                    h = ST(
                        in_channels=ch,
                        n_heads=n_heads,
                        d_head=d_head,
                        depth=self.transformer_depth,
                        context_dim=self.context_dim,
                        use_linear=self.use_linear_in_transformer,
                        dtype=self.dtype,
                        name=f"output_blocks_{blk}_{sub}",
                    )(h, context)
                    sub += 1
                if level != 0 and i == self.num_res_blocks:
                    h = Upsample(out_channels=ch, dtype=self.dtype, name=f"output_blocks_{blk}_{sub}")(h)
                blk += 1

        h = GroupNorm32(name="out_norm")(h)
        h = silu(h)
        h = conv(self.out_channels, 3, padding=1, zero=True, dtype=self.dtype, name="out_conv")(h)
        return h.astype(jnp.float32)
