"""Spatial/cross attention transformer for the LDM UNet/ControlNet.

TPU-native re-design of ``model/attention.py`` (/root/reference):

* one attention op (``edtr_tpu.ops.attention``) replaces the reference's
  vanilla/xformers/SDPA trio — fp32 softmax always (the reference forces
  ATTN_PRECISION=fp32, ``model/attention.py:16,84-91``);
* tokens stay in ``(B, N, H, D)`` layout so the head axis never leaves the
  minor-most 128-lane tile;
* gradient checkpointing is applied by the parent UNet via ``nn.remat`` —
  blocks themselves are pure.

Parity map:
  GEGLU                    -> model/attention.py:20-27
  FeedForward              -> model/attention.py:30-47
  CrossAttention (all 3)   -> model/attention.py:54-203
  BasicTransformerBlock    -> model/attention.py:206-234
  SpatialTransformer       -> model/attention.py:237-302
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from edtr_tpu.models.layers import (DenseParams, GroupNorm32, LayerNorm,
                                    LNParams, conv, dense)
from edtr_tpu.ops import geglu, ln_matmul
from edtr_tpu.ops._norms import ln_f32
from edtr_tpu.ops.attention import dot_product_attention

Dtype = Any


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when ``context`` is None.

    ``pre_norm=(scale, bias)`` means ``x`` is the PRE-LayerNorm residual
    stream: the norm is fused into the q/k/v projections
    (ops/ln_matmul.py) so the normalized tokens never touch HBM. The
    caller (BasicTransformerBlock) owns the norm params.
    """

    query_dim: int
    context_dim: Optional[int] = None
    heads: int = 8
    dim_head: int = 64
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: Optional[jnp.ndarray] = None,
        pre_norm=None,
    ) -> jnp.ndarray:
        inner_dim = self.heads * self.dim_head
        if pre_norm is not None:
            s, bb = pre_norm
            xc = x.astype(self.dtype or x.dtype)
            if context is None:
                wq, _ = DenseParams(self.query_dim, inner_dim, False, name="to_q")()
                wk, _ = DenseParams(self.query_dim, inner_dim, False, name="to_k")()
                wv, _ = DenseParams(self.query_dim, inner_dim, False, name="to_v")()
                q, k, v = ln_matmul.ln_matmuls(xc, s, bb, wq, wk, wv)
            else:
                wq, _ = DenseParams(self.query_dim, inner_dim, False, name="to_q")()
                (q,) = ln_matmul.ln_matmuls(xc, s, bb, wq)
                k = dense(inner_dim, use_bias=False, dtype=self.dtype,
                          name="to_k")(context)
                v = dense(inner_dim, use_bias=False, dtype=self.dtype,
                          name="to_v")(context)
        else:
            ctx = x if context is None else context
            q = dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_q")(x)
            k = dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
            v = dense(inner_dim, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        out = dot_product_attention(q, k, v, scale=self.dim_head ** -0.5)
        out = out.reshape(b, n, inner_dim)
        return dense(self.query_dim, dtype=self.dtype, name="to_out")(out)


class FeedForward(nn.Module):
    """GEGLU feedforward (``glu=True`` path, the only one configs use)."""

    dim: int
    mult: int = 4
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, pre_norm=None) -> jnp.ndarray:
        inner = int(self.dim * self.mult)
        if geglu.will_fuse(x.shape[1], x.shape[2], inner):
            # fused Pallas projection: the 2*inner intermediate never
            # touches HBM (ops/geglu.py). Param tree identical to the
            # dense path below. pre_norm additionally absorbs the block's
            # norm3 (exact-gelu + torch LN semantics either way). The
            # measured dispatch table (ops/dispatch.py) decides per shape;
            # when it says XLA, the *packed* single-GEMM legacy graph below
            # runs — not a split-GEMM reference detour.
            k, b = DenseParams(self.dim, inner * 2, name="proj")()
            xc = x.astype(self.dtype or x.dtype)
            halves = (k[:, :inner], k[:, inner:], b[:inner], b[inner:])
            if pre_norm is not None:
                h = geglu.ln_geglu_proj(xc, pre_norm[0], pre_norm[1], *halves)
            else:
                h = geglu.geglu_proj(xc, *halves)
        else:
            if pre_norm is not None:
                x = ln_f32(x, pre_norm[0], pre_norm[1]).astype(
                    self.dtype or x.dtype)
            proj = dense(inner * 2, dtype=self.dtype, name="proj")(x)
            h, gate = jnp.split(proj, 2, axis=-1)
            # torch F.gelu is the exact (erf) formulation
            h = h * jax.nn.gelu(gate, approximate=False)
        return dense(self.dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    dim: int
    n_heads: int
    d_head: int
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # norms are declared here (torch tree: norm1/2/3) but applied
        # INSIDE the fused LN+GEMM ops — the normalized token tensors
        # never round-trip HBM (reference fallbacks inside the ops).
        ln1 = LNParams(self.dim, name="norm1")()
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim if self.disable_self_attn else None,
            heads=self.n_heads,
            dim_head=self.d_head,
            dtype=self.dtype,
            name="attn1",
        )(x, context=context if self.disable_self_attn else None,
          pre_norm=ln1)
        ln2 = LNParams(self.dim, name="norm2")()
        x = x + CrossAttention(
            query_dim=self.dim,
            context_dim=self.context_dim,
            heads=self.n_heads,
            dim_head=self.d_head,
            dtype=self.dtype,
            name="attn2",
        )(x, context=context, pre_norm=ln2)
        ln3 = LNParams(self.dim, name="norm3")()
        x = x + FeedForward(dim=self.dim, dtype=self.dtype, name="ff")(
            x, pre_norm=ln3)
        return x


class SpatialTransformer(nn.Module):
    """Project NHWC features to tokens, run transformer blocks, project back.

    ``use_linear=True`` (all SD2.1 configs) uses Linear proj_in/out applied in
    token space; proj_out is zero-initialized (``model/attention.py:274-280``).
    """

    in_channels: int
    n_heads: int
    d_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    disable_self_attn: bool = False
    use_linear: bool = True
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        inner_dim = self.n_heads * self.d_head
        x_in = x
        if self.use_linear:
            # GroupNorm folds to a per-(B, C) affine applied inside the
            # proj_in GEMM tiles (ops/ln_matmul.py:affine_matmul) — the
            # normalized tokens never round-trip HBM. Param tree identical
            # to the GroupNorm32 + dense path.
            xc = x.astype(self.dtype or x.dtype)
            mul, add = GroupNorm32(epsilon=1e-6, fold=True, name="norm")(xc)
            wk, bk = DenseParams(c, inner_dim, name="proj_in")()
            x = ln_matmul.affine_matmul(
                xc.reshape(b, h * w, c), mul, add, wk, bk)
        else:
            x = GroupNorm32(num_groups=32, epsilon=1e-6, name="norm")(x)
            x = conv(inner_dim, 1, dtype=self.dtype, name="proj_in")(x)
            x = x.reshape(b, h * w, x.shape[-1])
        for d in range(self.depth):
            x = BasicTransformerBlock(
                dim=inner_dim,
                n_heads=self.n_heads,
                d_head=self.d_head,
                context_dim=self.context_dim,
                disable_self_attn=self.disable_self_attn,
                dtype=self.dtype,
                name=f"blocks_{d}",
            )(x, context=context)
        if self.use_linear:
            x = dense(self.in_channels, zero=True, dtype=self.dtype, name="proj_out")(x)
        x = x.reshape(b, h, w, x.shape[-1])
        if not self.use_linear:
            x = conv(self.in_channels, 1, zero=True, dtype=self.dtype, name="proj_out")(x)
        return x + x_in
