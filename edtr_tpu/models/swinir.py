"""SwinIR restoration network (NHWC, flax).

TPU-native re-design of ``model/swinir.py`` (/root/reference):

  WindowAttention        -> model/swinir.py:69     (relative position bias)
  SwinTransformerBlock   -> model/swinir.py:170    (shifted windows)
  RSTB                   -> model/swinir.py:425    (residual swin group+conv)
  SwinIR                 -> model/swinir.py:627-894

TPU-first decisions:
* window partition/reverse are pure reshapes/transposes on NHWC — no
  im2col-style gathers; the (B*nW, win², heads, d) batch rides the MXU via
  ``edtr_tpu.ops.attention`` with the relative-position bias as an additive
  logit bias;
* the shifted-window attention mask and relative-position index are computed
  in numpy at trace time (static shapes) and baked into the graph as
  constants — no dynamic control flow;
* DropPath/Dropout are inference-identity (rates are 0 at eval; training
  stochastic depth has "no impact on SR results" per the reference comment,
  model/swinir.py:747 — we keep them off for determinism and document it).

The EDTR config ("unshuffle" mode, model/swinir.py:703-708) runs
PixelUnshuffle(sf) before conv_first so the transformer works at 1/8
resolution, then reconstructs with the 'nearest+conv' x8 tail — i.e.
same-resolution restoration at 512².
"""

from __future__ import annotations

from functools import lru_cache
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from edtr_tpu.models.layers import (ConvParams, DenseParams, LayerNorm,
                                    LNParams, conv, dense)
from edtr_tpu.ops import gn_conv, swin_block
from edtr_tpu.ops.window_attention import window_attention

Dtype = Any

RGB_MEAN = (0.4488, 0.4371, 0.4040)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel-unshuffle with torch channel ordering (C, r, r)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // r, r, w // r, r, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # B, H/r, W/r, C, r, r
    return x.reshape(b, h // r, w // r, c * r * r)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel-shuffle, inverse of :func:`pixel_unshuffle`."""
    b, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(b, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, C
    return x.reshape(b, h * r, w * r, c)


def window_partition(x: jnp.ndarray, win: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*nW, win*win, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // win, win, w // win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, win * win, c)


def window_reverse(windows: jnp.ndarray, win: int, h: int, w: int) -> jnp.ndarray:
    """(B*nW, win*win, C) -> (B, H, W, C)."""
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // win) * (w // win))
    x = windows.reshape(b, h // win, w // win, win, win, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


@lru_cache(maxsize=32)
def relative_position_index(win: int) -> np.ndarray:
    """Standard Swin relative-position index, (win², win²) int32."""
    coords = np.stack(
        np.meshgrid(np.arange(win), np.arange(win), indexing="ij")
    )  # (2, w, w)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, w², w²)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += win - 1
    rel[:, :, 1] += win - 1
    rel[:, :, 0] *= 2 * win - 1
    return rel.sum(-1).astype(np.int32)


@lru_cache(maxsize=64)
def shift_attention_mask(h: int, w: int, win: int, shift: int) -> Optional[np.ndarray]:
    """Additive (-100/0) mask for shifted windows, (nW, win², win²) fp32.

    Parity: ``calculate_mask`` in the reference SwinTransformerBlock.
    """
    if shift == 0:
        return None
    img_mask = np.zeros((1, h, w, 1), np.float32)
    cnt = 0
    for hs in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
        for ws in (slice(0, -win), slice(-win, -shift), slice(-shift, None)):
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    mw = img_mask.reshape(1, h // win, win, w // win, win, 1)
    mw = mw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, win * win)
    attn_mask = mw[:, None, :] - mw[:, :, None]
    return np.where(attn_mask != 0, -100.0, 0.0).astype(np.float32)



def _rel_pos_bias(table: jnp.ndarray, win: int) -> jnp.ndarray:
    """(H, win², win²) fp32 additive logit bias from the learned table —
    the ONE construction both the module path and the fused path use."""
    n = win * win
    idx = jnp.asarray(relative_position_index(win).reshape(-1))
    bias = jnp.take(table, idx, axis=0).reshape(n, n, table.shape[-1])
    return bias.transpose(2, 0, 1)


class WindowAttention(nn.Module):
    dim: int
    win: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Optional[Dtype] = None
    # lane padding (dim 180->192): the softmax scale must stay the REAL
    # head dim's (30**-0.5) — padded q/k dims are zero and add nothing to
    # the logits, but the scale is a constant of the trained model
    scale_dim: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[np.ndarray] = None
    ) -> jnp.ndarray:
        bw, n, c = x.shape
        d_head = self.dim // self.num_heads
        d_scale = (self.scale_dim or self.dim) // self.num_heads
        qkv = dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, d_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.win - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        bias = _rel_pos_bias(table, self.win)  # (H, n, n)

        # fused Pallas path: per-window softmax(QKᵀ+bias[+mask])V entirely in
        # VMEM — no (BW, H, n, n) logits in HBM and no mask tiling to the
        # window batch (ops/window_attention.py; XLA broadcast fallback
        # inside). The shift mask applies per window position, image-major.
        out = window_attention(
            q, k, v, bias,
            mask=None if mask is None else jnp.asarray(mask),
            scale=d_scale ** -0.5)
        out = out.reshape(bw, n, c)
        return dense(self.dim, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)
        return dense(self.out, dtype=self.dtype, name="fc2")(x)


# --- param holders for the fused path -------------------------------------
# The fused kernels (ops/swin_block.py) consume raw weight arrays; the
# shared holders (models/layers.py: DenseParams/LNParams) declare EXACTLY
# the same param tree (names, shapes, initializers) as the module path
# above, so checkpoints/converters are path-identical whichever path runs.


class _AttnParams(nn.Module):
    dim: int
    win: int
    num_heads: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self):
        k, b = DenseParams(self.dim, self.dim * 3, self.qkv_bias,
                           name="qkv")()
        qkv = (k, b if b is not None else jnp.zeros((self.dim * 3,),
                                                    jnp.float32))
        table = self.param(
            "relative_position_bias_table", nn.initializers.normal(0.02),
            ((2 * self.win - 1) ** 2, self.num_heads), jnp.float32)
        proj = DenseParams(self.dim, self.dim, True, name="proj")()
        return qkv, table, proj


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        fc1 = DenseParams(self.dim, self.hidden, True, name="fc1")()
        fc2 = DenseParams(self.hidden, self.dim, True, name="fc2")()
        return fc1, fc2


class SwinTransformerBlock(nn.Module):
    """One Swin block; ``fused=True`` runs the Pallas-fused halves.

    Fused contract (ops/swin_block.py): the input arrives rolled by
    ``in_offset`` and the output is returned rolled by this block's
    ``shift`` — per-token ops commute with the cyclic roll, so the unroll
    is deferred to the RSTB's end (one roll per 6 blocks instead of two
    per shifted block, and ``swin_post`` stays row-slab parallel).
    """

    dim: int
    num_heads: int
    win: int
    shift: int
    mlp_ratio: float = 2.0
    dtype: Optional[Dtype] = None
    fused: bool = True
    # lane padding: real channel count for LN statistics + softmax scale
    # (0 = dim is real). Padded channels are guaranteed-zero by the
    # pad_swinir_lanes converter contract (utils/convert.py).
    ln_dim: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, x_size: Tuple[int, int], in_offset: int = 0
    ) -> jnp.ndarray:
        h, w = x_size
        b, n, c = x.shape
        shift = self.shift if min(h, w) > self.win else 0

        if self.fused and swin_block.will_fuse(h, w, self.win, self.dim):
            (qkv_k, qkv_b), table, (proj_k, proj_b) = _AttnParams(
                dim=self.dim, win=self.win, num_heads=self.num_heads,
                name="attn")()
            ln1_s, ln1_b = LNParams(c, name="norm1")()
            ln2_s, ln2_b = LNParams(c, name="norm2")()
            (fc1_k, fc1_b), (fc2_k, fc2_b) = _MlpParams(
                c, int(self.dim * self.mlp_ratio), name="mlp")()

            xc = x.astype(self.dtype or x.dtype)
            qkv_w, xr = swin_block.swin_pre(
                xc, ln1_s, ln1_b, qkv_k, qkv_b, h, w, self.win,
                shift - in_offset, self.ln_dim)
            nw = qkv_w.shape[1]
            d_head = self.dim // self.num_heads
            d_scale = (self.ln_dim or self.dim) // self.num_heads
            qkv = qkv_w.reshape(b * nw, self.win * self.win, 3,
                                self.num_heads, d_head)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            bias = _rel_pos_bias(table, self.win)
            mask = shift_attention_mask(h, w, self.win, shift)
            out = window_attention(
                q, k, v, bias,
                mask=None if mask is None else jnp.asarray(mask),
                scale=d_scale ** -0.5)
            attn = out.reshape(b, nw, self.win * self.win, c)
            return swin_block.swin_post(
                attn, xr, proj_k, proj_b, ln2_s, ln2_b,
                fc1_k, fc1_b, fc2_k, fc2_b, h, w, self.win, self.ln_dim)

        shortcut = x
        x = LayerNorm(name="norm1", stat_dim=self.ln_dim)(x).reshape(b, h, w, c)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        windows = window_partition(x, self.win)
        mask = shift_attention_mask(h, w, self.win, shift)
        attn = WindowAttention(
            dim=self.dim, win=self.win, num_heads=self.num_heads,
            dtype=self.dtype, scale_dim=self.ln_dim, name="attn",
        )(windows, mask)
        x = window_reverse(attn, self.win, h, w)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, n, c)
        x = x + Mlp(
            hidden=int(self.dim * self.mlp_ratio), out=self.dim,
            dtype=self.dtype, name="mlp",
        )(LayerNorm(name="norm2", stat_dim=self.ln_dim)(x))
        return x


class RSTB(nn.Module):
    """Residual Swin Transformer Block group + trailing conv."""

    dim: int
    depth: int
    num_heads: int
    win: int
    mlp_ratio: float = 2.0
    dtype: Optional[Dtype] = None
    fused: bool = True
    ln_dim: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_size: Tuple[int, int]) -> jnp.ndarray:
        h, w = x_size
        use_fused = self.fused and swin_block.will_fuse(h, w, self.win,
                                                        self.dim)
        res = x
        off = 0
        for j in range(self.depth):
            x = SwinTransformerBlock(
                dim=self.dim, num_heads=self.num_heads, win=self.win,
                shift=0 if j % 2 == 0 else self.win // 2,
                mlp_ratio=self.mlp_ratio, dtype=self.dtype,
                fused=use_fused, ln_dim=self.ln_dim, name=f"blocks_{j}",
            )(x, x_size, in_offset=off)
            if use_fused:
                off = ((self.win // 2 if j % 2 else 0)
                       if min(h, w) > self.win else 0)
        b, n, c = x.shape
        x = x.reshape(b, h, w, c)
        if off:  # undo the deferred cyclic shift of the last fused block
            x = jnp.roll(x, (off, off), axis=(1, 2))
        x = conv(self.dim, 3, padding=1, dtype=self.dtype, name="conv")(x)
        return x.reshape(b, n, c) + res


class SwinIR(nn.Module):
    """SwinIR; config surface matches the reference constructor."""

    img_size: int = 64
    patch_size: int = 1
    in_chans: int = 3
    embed_dim: int = 180
    depths: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6)
    num_heads: Sequence[int] = (6, 6, 6, 6, 6, 6, 6, 6)
    window_size: int = 8
    mlp_ratio: float = 2.0
    sf: int = 8
    img_range: float = 1.0
    upsampler: str = "nearest+conv"
    resi_connection: str = "1conv"
    unshuffle: bool = False
    unshuffle_scale: Optional[int] = None
    dtype: Optional[Dtype] = None
    fused: bool = True  # Pallas-fused swin blocks (ops/swin_block.py)
    # MXU/VPU lane alignment (round 5, VERDICT r4 #2): pad the embed dim by
    # ``lane_pad`` channels (180 -> 192 = 1.5x128 lanes; head dim 30 -> 32)
    # with GUARANTEED-ZERO padded weights — outputs are bit-equal to the
    # unpadded net (LN stats keep the real divisor, softmax scale keeps the
    # real head dim, zeros propagate through every GEMM/GELU). Params MUST
    # come from utils/convert.py:pad_swinir_lanes — random init of a padded
    # module is NOT the same function as the unpadded one.
    lane_pad: int = 0
    # accepted-but-unused reference knobs (parity of constructor surface)
    qkv_bias: bool = True
    qk_scale: Optional[float] = None
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: bool = False
    hq_key: str = "jpg"
    lq_key: str = "hint"
    learning_rate: Optional[float] = None
    weight_decay: Optional[float] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert self.resi_connection == "1conv", "only '1conv' is used by configs"
        P = self.embed_dim + self.lane_pad       # padded (physical) width
        ln_dim = self.embed_dim if self.lane_pad else 0
        H, W = x.shape[1], x.shape[2]

        # check_image_size: reflect-pad to window multiple (model/swinir.py:834-839)
        win_mult = self.window_size * (self.unshuffle_scale if self.unshuffle else 1)
        ph = (win_mult - H % win_mult) % win_mult
        pw = (win_mult - W % win_mult) % win_mult
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        mean = jnp.asarray(RGB_MEAN, x.dtype) if self.in_chans == 3 else 0.0
        x = (x - mean) * self.img_range
        x = x.astype(self.dtype or x.dtype)

        # shallow feature extraction
        if self.unshuffle:
            feat = pixel_unshuffle(x, self.sf)
            feat = conv(P, 3, padding=1, dtype=self.dtype, name="conv_first_1")(feat)
        else:
            feat = conv(P, 3, padding=1, dtype=self.dtype, name="conv_first")(x)

        b, h, w, c = feat.shape
        x_size = (h, w)

        # deep features: tokens (B, L, C)
        t = feat.reshape(b, h * w, c)
        if self.patch_norm:
            t = LayerNorm(name="patch_embed_norm", stat_dim=ln_dim)(t)
        for i, depth in enumerate(self.depths):
            t = RSTB(
                dim=P, depth=depth, num_heads=self.num_heads[i],
                win=self.window_size, mlp_ratio=self.mlp_ratio,
                dtype=self.dtype, fused=self.fused, ln_dim=ln_dim,
                name=f"layers_{i}",
            )(t, x_size)
        t = LayerNorm(name="norm", stat_dim=ln_dim)(t)
        deep = t.reshape(b, h, w, c)
        deep = conv(P, 3, padding=1, dtype=self.dtype, name="conv_after_body")(deep)
        feat = feat + deep

        lrelu = lambda v: jax.nn.leaky_relu(v, negative_slope=0.2)
        num_feat = 64
        if self.upsampler == "nearest+conv":
            feat = conv(num_feat, 3, padding=1, dtype=self.dtype, name="conv_before_upsample_0")(feat)
            feat = jax.nn.leaky_relu(feat, negative_slope=0.01)  # nn.LeakyReLU(inplace=True) default slope
            # nearest-2x + conv + lrelu fused: the 2x tensor never touches
            # HBM (ops/gn_conv.py:upsample_conv; XLA reference inside)
            def up_conv(v, name):
                w, b = ConvParams(3, 3, num_feat, num_feat, name=name)()
                return gn_conv.upsample_conv(v, w, b, "lrelu", "swinir")

            feat = up_conv(feat, "conv_up1")
            if self.sf >= 4:
                feat = up_conv(feat, "conv_up2")
            if self.sf == 8:
                feat = up_conv(feat, "conv_up3")
            feat = lrelu(conv(num_feat, 3, padding=1, dtype=self.dtype, name="conv_hr")(feat))
            out = conv(self.in_chans, 3, padding=1, dtype=self.dtype, name="conv_last")(feat)
        elif self.upsampler == "pixelshuffle":
            feat = conv(num_feat, 3, padding=1, dtype=self.dtype, name="conv_before_upsample_0")(feat)
            feat = jax.nn.leaky_relu(feat, negative_slope=0.01)
            n_up = {2: 1, 4: 2, 8: 3}[self.sf]
            for i in range(n_up):
                feat = conv(num_feat * 4, 3, padding=1, dtype=self.dtype, name=f"upsample_{i * 2}")(feat)
                feat = pixel_shuffle(feat, 2)
            out = conv(self.in_chans, 3, padding=1, dtype=self.dtype, name="conv_last")(feat)
        else:  # denoise / CAR: residual, no upsample
            out = conv(self.in_chans, 3, padding=1, dtype=self.dtype, name="conv_last")(feat)
            out = x + out

        out = out.astype(jnp.float32) / self.img_range + mean
        # reference crops to H*sf regardless of unshuffle (model/swinir.py:894);
        # in unshuffle mode the output is H-sized so this is a no-op.
        return out[:, : H * self.sf, : W * self.sf, :]


def _nearest2x(x: jnp.ndarray) -> jnp.ndarray:
    from edtr_tpu.models.layers import nearest_upsample_2x

    return nearest_upsample_2x(x)
