"""Fused windowed attention for SwinIR on TPU (Pallas).

SwinIR's window attention (reference ``model/swinir.py:69-167``) runs
softmax(QKᵀ·scale + rel_pos_bias [+ shift_mask])V over many tiny windows:
at the flagship 512² config, 64 windows of 64 tokens × 6 heads × d_head 30
per image. XLA executes this as batched micro-GEMMs with the (BW, H, N, N)
logits round-tripping through HBM, and the shifted-window path additionally
materializes the mask tiled to the full window batch. The chip profile
(tools/profile_swinir.py) put the attention core at ~5.4 ms/img of SwinIR's
10.7 — nearly all memory traffic.

This kernel keeps everything per-window in VMEM: one grid cell covers G
windows for one head, computes both GEMMs and the fp32 softmax in-register,
adds the relative-position bias once per head and the shift mask once per
window block (the mask block is re-used across the inner head iterations by
Pallas' same-block elision), and writes only the (G, N, 1, D) output slab.
HBM traffic per layer drops from ~6× the qkv size to ~1×.

Backward is XLA recompute (`jax.custom_vjp`): the training path (swinir
pre-training recipes) sees the same math as the XLA oracle; the N² tensors
live in HBM there, which is fine off the serving hot path. The bias grad
flows (the rel-pos table is trainable); the mask is a trace-time constant.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["window_attention", "kernel_supported"]


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


def kernel_supported(q: jnp.ndarray, n_win_mask: Optional[int]) -> bool:
    """Shapes the fused kernel accepts: small windows, lane-friendly dims."""
    bw, n, h, d = q.shape
    if n > 128 or n % 8 != 0 or d > 128:
        return False
    if bw % _pick_g(bw, n_win_mask) != 0:  # pragma: no cover - defensive
        return False
    return True


def _pick_g(bw: int, n_win_mask: Optional[int]) -> int:
    """Windows per grid cell: largest of 16/8/4/2/1 dividing the batch (and
    the mask period, so a block never straddles two images' mask rows)."""
    for g in (16, 8, 4, 2, 1):
        if bw % g == 0 and (n_win_mask is None or n_win_mask % g == 0):
            return g
    return 1


def _win_kernel(q_ref, k_ref, v_ref, b_ref, m_ref, o_ref, *, scale, g):
    bias = b_ref[0]  # (N, N) f32, this head's relative-position bias
    for j in range(g):
        q = q_ref[0, j]  # (N, D)
        k = k_ref[0, j]
        v = v_ref[0, j]
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
        s = s + bias + m_ref[j]
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
        o_ref[0, j] = o.astype(o_ref.dtype)


def _win_fwd(q, k, v, bias, mask, scale):
    bw, n, h, d = q.shape
    nwm = None if mask is None else mask.shape[0]
    g = _pick_g(bw, nwm)
    if mask is None:
        mask = jnp.zeros((g, n, n), jnp.float32)
        nwm = g
    # head-major layout: TPU block shapes must have their LAST TWO dims
    # divide (8, 128) or equal the array dims, so the per-head (N, D)
    # planes must be the trailing dims. The transposes replace the layout
    # churn XLA's unpack/merge around the qkv dense inserts anyway.
    qh = q.transpose(2, 0, 1, 3)  # (H, BW, N, D)
    kh = k.transpose(2, 0, 1, 3)
    vh = v.transpose(2, 0, 1, 3)
    # grid order: head INNERMOST so the per-window mask block is elided
    # (same block index) across the h iterations of one window block
    grid = (bw // g, h)
    qkv_spec = pl.BlockSpec((1, g, n, d), lambda i, hh: (hh, i, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_win_kernel, scale=scale, g=g),
        grid=grid,
        in_specs=[
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec((1, n, n), lambda i, hh: (hh, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, n, n), lambda i, hh: (i % (nwm // g), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, g, n, d), lambda i, hh: (hh, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, bw, n, d), v.dtype),
        interpret=_interpret(),
    )(qh, kh, vh, bias, mask)
    return out.transpose(1, 2, 0, 3)  # back to (BW, N, H, D)


def _xla_reference(q, k, v, bias, mask, scale):
    """Broadcast XLA path: no mask tiling to the window batch.

    (BW, N, H, D) -> logits (BW, H, N, N) fp32; the shift mask broadcasts
    per image through a (B, nW, H, N, N) view.
    """
    f32 = jnp.float32
    s = jnp.einsum("wnhd,wmhd->whnm", q, k, preferred_element_type=f32) * scale
    s = s + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        b = q.shape[0] // nw
        s = (s.reshape(b, nw, *s.shape[1:]) + mask[None, :, None]).reshape(s.shape)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("whnm,wmhd->wnhd", p.astype(v.dtype), v,
                      preferred_element_type=f32).astype(v.dtype)


def _bwd_math(q, k, v, bias, mask, scale, dout):
    f32 = jnp.float32
    s = jnp.einsum("wnhd,wmhd->whnm", q, k, preferred_element_type=f32) * scale
    s = s + bias[None]
    if mask is not None:
        nw = mask.shape[0]
        b = q.shape[0] // nw
        s = (s.reshape(b, nw, *s.shape[1:]) + mask[None, :, None]).reshape(s.shape)
    p = jax.nn.softmax(s, axis=-1)                          # (BW, H, N, N) f32
    do = dout.astype(f32)
    dv = jnp.einsum("whnm,wnhd->wmhd", p, do).astype(v.dtype)
    dp = jnp.einsum("wnhd,wmhd->whnm", do, v.astype(f32))
    dd = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = p * (dp - dd)                                      # d(logits)
    dq = (jnp.einsum("whnm,wmhd->wnhd", ds, k.astype(f32)) * scale).astype(q.dtype)
    dk = (jnp.einsum("whnm,wnhd->wmhd", ds, q.astype(f32)) * scale).astype(k.dtype)
    dbias = jnp.sum(ds, axis=0)                             # (H, N, N)
    return dq, dk, dv, dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _window_attention(q, k, v, bias, mask, scale):
    # Dispatch: the broadcast-XLA path by default. The Pallas kernel is
    # numerically verified on-chip (max err 4e-3 at bf16) but MEASURED
    # SLOWER than XLA's batched einsum at the flagship shapes (0.713 vs
    # 0.557 ms/call shifted, 0.623 vs 0.534 unshifted, bs8 512² —
    # per-window (64,30) dots underfill the MXU while XLA pipelines the
    # 3072-deep batch; the N² softmax is VPU-bound either way). Kept
    # opt-in via EDTR_WINDOW_ATTN=pallas for future tuning.
    import os

    if (os.environ.get("EDTR_WINDOW_ATTN") == "pallas"
            and not _interpret()
            and kernel_supported(q, None if mask is None else mask.shape[0])):
        return _win_fwd(q, k, v, bias, mask, scale)
    return _xla_reference(q, k, v, bias, mask, scale)


def _fwd_rule(q, k, v, bias, mask, scale):
    return _window_attention(q, k, v, bias, mask, scale), (q, k, v, bias, mask)


def _bwd_rule(scale, res, dout):
    q, k, v, bias, mask = res
    dq, dk, dv, dbias = _bwd_math(q, k, v, bias, mask, scale, dout)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dq, dk, dv, dbias.astype(bias.dtype), dmask


_window_attention.defvjp(_fwd_rule, _bwd_rule)


def window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """softmax(q kᵀ·scale + bias [+ mask]) v over a batch of windows.

    Args:
      q/k/v: (BW, N, H, D) — BW = batch·windows, N = tokens per window.
      bias: (H, N, N) fp32 additive logit bias (Swin relative position).
      mask: optional (nW, N, N) fp32 shift mask; window ``w`` gets row
        ``w % nW`` (windows are ordered image-major).
      scale: defaults to D**-0.5.
    Returns:
      (BW, N, H, D) in v.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    return _window_attention(q, k, v, bias.astype(jnp.float32), mask, scale)
