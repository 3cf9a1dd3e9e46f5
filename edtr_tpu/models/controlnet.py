"""ControlNet: SD UNet encoder clone emitting 13 zero-conv control residuals.

TPU-native re-design of ``model/controlnet.py:44-277`` (/root/reference):
the first conv takes ``concat(x, hint)`` on the channel axis
(``model/controlnet.py:266``; the reference zero-pads the pretrained SD conv
kernel with extra input channels at weight-surgery time,
``model/cldm.py:84-105`` — our converter does the same); each encoder block
and the middle block are tapped through zero-initialized 1x1 convs.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.attention import SpatialTransformer
from edtr_tpu.models.layers import conv, dense, silu, timestep_embedding
from edtr_tpu.models.unet import Downsample, ResBlock, _heads_for

Dtype = Any


class ControlNet(nn.Module):
    in_channels: int = 4
    hint_channels: int = 4
    model_channels: int = 320
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
        hint: jnp.ndarray,
        timesteps: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, ...]:
        from edtr_tpu.models.layers import remat

        Res = remat(ResBlock) if self.use_checkpoint else ResBlock
        ST = remat(SpatialTransformer) if self.use_checkpoint else SpatialTransformer
        mc = self.model_channels

        t_emb = timestep_embedding(timesteps, mc)
        emb = dense(mc * 4, dtype=self.dtype, name="time_embed_0")(t_emb)
        emb = dense(mc * 4, dtype=self.dtype, name="time_embed_2")(silu(emb))

        h = jnp.concatenate([x, hint], axis=-1).astype(self.dtype or x.dtype)
        if context is not None:
            context = context.astype(self.dtype or context.dtype)

        outs = []
        h = conv(mc, 3, padding=1, dtype=self.dtype, name="input_blocks_0_0")(h)
        outs.append(conv(mc, 1, zero=True, dtype=self.dtype, name="zero_convs_0")(h))

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
                outs.append(
                    conv(ch, 1, zero=True, dtype=self.dtype, name=f"zero_convs_{blk}")(h)
                )
                blk += 1
            if level != len(self.channel_mult) - 1:
                h = Downsample(out_channels=ch, dtype=self.dtype, name=f"input_blocks_{blk}_0")(h)
                outs.append(
                    conv(ch, 1, zero=True, dtype=self.dtype, name=f"zero_convs_{blk}")(h)
                )
                blk += 1
                ds *= 2

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
        outs.append(
            conv(ch, 1, zero=True, dtype=self.dtype, name="middle_block_out")(h)
        )
        return tuple(outs)
