"""Frozen OpenCLIP ViT-H text tower (text transformer only).

TPU-native re-design of ``FrozenOpenCLIPEmbedder`` (``model/clip.py:12-65``)
+ the text side of ``model/open_clip/{model,transformer}.py``:

* the vision tower is never built (the reference deletes it,
  ``model/clip.py:26``);
* ``layer="penultimate"`` stops before the final resblock
  (``model/clip.py:50-58``); output is ``ln_final`` over the full 77-token
  sequence — no text_projection / argmax pooling;
* causal mask is an additive -inf upper triangle
  (``model/open_clip/transformer.py:563``), applied to fp32 logits.

Tokenization is host-side (``edtr_tpu.data.tokenizer``).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.layers import LayerNorm, dense

Dtype = Any


class ResidualAttentionBlock(nn.Module):
    """Pre-LN attention + MLP block (``model/open_clip/transformer.py:199-254``)."""

    width: int
    heads: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_bias: jnp.ndarray) -> jnp.ndarray:
        b, n, c = x.shape
        d_head = self.width // self.heads

        h = LayerNorm(name="ln_1")(x)
        q = dense(self.width, dtype=self.dtype, name="q_proj")(h)
        k = dense(self.width, dtype=self.dtype, name="k_proj")(h)
        v = dense(self.width, dtype=self.dtype, name="v_proj")(h)
        q = q.reshape(b, n, self.heads, d_head)
        k = k.reshape(b, n, self.heads, d_head)
        v = v.reshape(b, n, self.heads, d_head)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        )
        logits = logits.astype(jnp.float32) * (d_head ** -0.5) + attn_bias
        weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(b, n, c)
        x = x + dense(self.width, dtype=self.dtype, name="out_proj")(out)

        h = LayerNorm(name="ln_2")(x)
        h = dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
        h = jax.nn.gelu(h, approximate=False)  # torch nn.GELU (erf) parity
        h = dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Text transformer; ``__call__(tokens) -> (B, context_length, width)``."""

    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        emb = self.param(
            "token_embedding",
            nn.initializers.normal(0.02),
            (self.vocab_size, self.width),
            jnp.float32,
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
            jnp.float32,
        )
        x = jnp.take(emb, tokens, axis=0) + pos[None]
        x = x.astype(self.dtype or x.dtype)

        n = self.context_length
        causal = jnp.triu(jnp.full((n, n), -jnp.inf, jnp.float32), k=1)
        attn_bias = causal[None, None]  # (1, 1, N, N)

        n_layers = self.layers - 1 if self.penultimate else self.layers
        for i in range(n_layers):
            x = ResidualAttentionBlock(
                width=self.width,
                heads=self.heads,
                dtype=self.dtype,
                name=f"resblocks_{i}",
            )(x, attn_bias)
        x = LayerNorm(name="ln_final")(x)
        return x.astype(jnp.float32)
