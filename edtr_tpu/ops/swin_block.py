"""Fused Swin transformer block halves for SwinIR on TPU (Pallas).

The SwinIR body (reference ``model/swinir.py:170-264``) is bandwidth-bound
on TPU: at the flagship 512² config (64×64 tokens, C=180, 48 blocks) the
chip profile (tools/profile_swinir.py) measured 1.25 ms/block @bs8 where the
attention einsum itself is only ~0.28 ms — the rest is LayerNorms, the
qkv/proj/MLP projections and the window partition/reverse transposes each
round-tripping the (B, 4096, 180) activations through HBM (~550 MB/block
vs a ~60 MB floor).

Two Pallas kernels fuse everything around the attention core:

* ``swin_pre``  — LN1 + cyclic shift + qkv projection + window partition.
  One grid cell per (image, window-row); the whole-image LN + roll runs
  once per image into VMEM scratch (grid is sequential on TPU, scratch
  persists across cells), then each window-row slab does its qkv GEMM and
  writes windows directly in partitioned layout.
* ``swin_post`` — window reverse + output projection + residual + LN2 +
  MLP + residual, fully row-slab parallel.

The attention core between them stays on the XLA einsum path
(``ops/window_attention.py``): its batched micro-GEMMs were measured
FASTER than an in-kernel per-window loop (0.56 vs 0.71 ms/call) — see the
dispatch note there.

Rolled-space contract: the cyclic un-shift after attention crosses
row-slab boundaries, so ``swin_post`` does NOT undo the shift. Instead all
per-token ops (proj/LN2/MLP/residuals) commute with the roll and every
block hands its successor tokens rolled by its own ``shift`` (the
``in_offset``/``out offset`` chain in ``models/swinir.py:RSTB``); the RSTB
un-rolls once before its trailing conv. ``swin_pre`` therefore rolls by
``shift - in_offset``.

Backward is XLA recompute via ``jax.custom_vjp`` over the reference-math
implementations (the SwinIR pre-training recipes differentiate through
this; the serving path never does). On CPU the reference path runs
directly — same math, golden-tested against torch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edtr_tpu.ops._norms import ln_f32 as _layernorm_f32


# test hook: force the Pallas path (interpret mode off-TPU)
_FORCE_KERNEL = False


def _use_kernel() -> bool:
    import os

    if os.environ.get("EDTR_SWIN_FUSED", "1") == "0":  # kill-switch
        return False
    return _FORCE_KERNEL or jax.default_backend() == "tpu"


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# v5e scoped VMEM is 16 MiB; the pre kernel's whole-image scratches are
# the binding allocation. 14 MiB leaves headroom for Mosaic's own stack.
# (Round-5 lesson: 1024² inputs — l=16384 tokens — blew the 16 MiB limit
# at compile time because this bound was missing; ab_e2e_1024.log.)
_VMEM_BUDGET = 14 * 1024 * 1024


def _pre_vmem_bytes(h: int, w: int, win: int, c: int, es: int = 2) -> int:
    """swin_pre's VMEM high-water estimate: input block + two whole-image
    (l, c) scratches + the window-row qkv/xr output slabs + params."""
    l = h * w
    nww = w // win
    return es * (3 * l * c                      # in block + 2 scratches
                 + nww * win * win * 3 * c      # qkv row slab
                 + win * w * c                  # xr row slab
                 + c * 3 * c + 4 * c)           # wqkv + 1-D params


def supported(h: int, w: int, win: int, c: int = 0) -> bool:
    """Shapes the fused kernels accept (flagship: h=w=64, win=8). With
    ``c`` given, also requires the pre kernel's VMEM plan to fit."""
    if not (h % win == 0 and w % win == 0 and h >= win and w >= win):
        return False
    return c == 0 or _pre_vmem_bytes(h, w, win, c) <= _VMEM_BUDGET


def will_fuse(h: int, w: int, win: int, c: int) -> bool:
    """Module-level dispatch (models/swinir.py:BasicLayer): supported
    shape AND a measured win in the dispatch table (ops/dispatch.py).
    The whole layer commits to one structure — the rolled-space contract
    chains consecutive fused blocks."""
    if _FORCE_KERNEL:
        return supported(h, w, win, c)
    if jax.default_backend() != "tpu" or not supported(h, w, win, c):
        return False
    from edtr_tpu.ops import dispatch

    return dispatch.decide("swin_block", f"{h}x{w}x{c}", h, w, c)


def _roll2d(x: jnp.ndarray, d: int, h: int, w: int) -> jnp.ndarray:
    """roll((h, w, c) view of (h*w, c), (-d, -d)) via static concats."""
    if d % h == 0 and d % w == 0:
        return x
    c = x.shape[-1]
    xi = x.reshape(h, w, c)
    dh, dw = d % h, d % w
    if dh:
        xi = jnp.concatenate([xi[dh:], xi[:dh]], axis=0)
    if dw:
        xi = jnp.concatenate([xi[:, dw:], xi[:, :dw]], axis=1)
    return xi.reshape(h * w, c)


# ---------------------------------------------------------------------------
# pre: LN1 + roll + qkv + window partition
# ---------------------------------------------------------------------------


def _pre_kernel(x_ref, lns_ref, lnb_ref, wqkv_ref, bqkv_ref,
                qkv_ref, xr_ref, xln_s, xraw_s,
                *, h, w, win, d, eps, stat_dim):
    wy = pl.program_id(1)
    rows = win * w  # tokens per window-row slab

    @pl.when(wy == 0)
    def _prep():  # once per image: LN + roll into persistent scratch
        x = x_ref[0]
        xln_s[...] = _roll2d(
            _layernorm_f32(x, lns_ref[...], lnb_ref[...], eps, stat_dim)
            .astype(xln_s.dtype), d, h, w)
        xraw_s[...] = _roll2d(x, d, h, w)

    slab = xln_s[pl.ds(wy * rows, rows), :]                      # (rows, C)
    qkv = jnp.dot(slab, wqkv_ref[...],
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...].astype(jnp.float32)).astype(qkv_ref.dtype)
    nww = w // win
    qkv = qkv.reshape(win, nww, win, qkv.shape[-1]).transpose(1, 0, 2, 3)
    qkv_ref[0] = qkv.reshape(nww, win * win, qkv.shape[-1])
    xr_ref[0] = xraw_s[pl.ds(wy * rows, rows), :]


def _pre_ref(x, ln_s, ln_b, wqkv, bqkv, h, w, win, d, stat_dim=0):
    """XLA reference: same math/cast points as the kernel."""
    b, l, c = x.shape
    cdtype = x.dtype
    xln = _layernorm_f32(x, ln_s, ln_b, 1e-5, stat_dim).astype(cdtype)
    xr = jax.vmap(lambda t: _roll2d(t, d, h, w))(x)
    xln = jax.vmap(lambda t: _roll2d(t, d, h, w))(xln)
    qkv = jnp.dot(xln, wqkv.astype(cdtype),
                  preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv.astype(jnp.float32)).astype(cdtype)      # (B, L, 3C)
    nww, nwh = w // win, h // win
    qkv = qkv.reshape(b, nwh, win, nww, win, qkv.shape[-1])
    qkv = qkv.transpose(0, 1, 3, 2, 4, 5)
    return qkv.reshape(b, nwh * nww, win * win, qkv.shape[-1]), xr


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def swin_pre(x, ln_s, ln_b, wqkv, bqkv, h, w, win, d, stat_dim=0):
    """LN1 + roll(-d) + qkv + window partition.

    Args:
      x: (B, L=h*w, C) tokens in compute dtype (input offset already
        folded into ``d`` by the caller).
      ln_s/ln_b: (C,) fp32 LayerNorm affine. wqkv: (C, 3C) fp32 (cast to
        x.dtype for the GEMM). bqkv: (3C,) fp32.
      d: roll amount ``shift - in_offset`` (0, ±win//2).
    Returns:
      (qkv windows (B, nW, win², 3C), x rolled (B, L, C)), both x.dtype.
    """
    b, l, c = x.shape
    if not _use_kernel():
        return _pre_ref(x, ln_s, ln_b, wqkv, bqkv, h, w, win, d, stat_dim)
    cdtype = x.dtype
    nww, nwh = w // win, h // win
    rows = win * w
    grid = (b, nwh)
    qkv_w, xr = pl.pallas_call(
        functools.partial(_pre_kernel, h=h, w=w, win=win, d=d, eps=1e-5,
                          stat_dim=stat_dim),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, l, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, nww, win * win, 3 * c),
                         lambda i, j: (i * nwh + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * nwh, nww, win * win, 3 * c), cdtype),
            jax.ShapeDtypeStruct((b, nwh * rows, c), cdtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((l, c), cdtype),
            pltpu.VMEM((l, c), cdtype),
        ],
        interpret=_interpret(),
        # XLA cost analysis can't see into the kernel: declare the qkv GEMM
        # flops so bench MFU accounting stays truthful after fusion
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * c * 3 * c,
            bytes_accessed=2 * b * l * c * 5 + 2 * c * 3 * c,
            transcendentals=0,
        ),
        # 1-D params reshaped to (1, n): TPU VMEM blocks want >=2 dims
    )(x, ln_s.reshape(1, c), ln_b.reshape(1, c),
      wqkv.astype(cdtype), bqkv.reshape(1, 3 * c))
    return qkv_w.reshape(b, nwh * nww, win * win, 3 * c), xr


def _pre_fwd(x, ln_s, ln_b, wqkv, bqkv, h, w, win, d, stat_dim):
    return swin_pre(x, ln_s, ln_b, wqkv, bqkv, h, w, win, d, stat_dim), (
        x, ln_s, ln_b, wqkv, bqkv)


def _pre_bwd(h, w, win, d, stat_dim, res, g):
    _, vjp = jax.vjp(lambda *a: _pre_ref(*a, h, w, win, d, stat_dim), *res)
    return vjp(g)


swin_pre.defvjp(_pre_fwd, _pre_bwd)


# ---------------------------------------------------------------------------
# post: window reverse + proj + residual + LN2 + MLP + residual
# ---------------------------------------------------------------------------


def _post_body(a_slab, xr_slab, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
               *, win, w, eps, stat_dim=0):
    """Shared per-slab math (kernel body and reference)."""
    c = xr_slab.shape[-1]
    nww = w // win
    cdtype = xr_slab.dtype
    a = a_slab.reshape(nww, win, win, c).transpose(1, 0, 2, 3)
    a = a.reshape(win * w, c)                                  # reversed slab
    proj = jnp.dot(a, wproj, preferred_element_type=jnp.float32)
    proj = proj + bproj.astype(jnp.float32)
    x1 = xr_slab + proj.astype(cdtype)
    xln = _layernorm_f32(x1, ln2s, ln2b, eps, stat_dim).astype(cdtype)
    h1 = jnp.dot(xln, w1, preferred_element_type=jnp.float32)
    h1 = h1 + b1.astype(jnp.float32)
    # exact erf-GELU via the fp32 polynomial (Mosaic has no erf lowering;
    # see ops/geglu.py:_erf_f32 — max abs err 1.5e-7, ~50x below bf16 ulp)
    from edtr_tpu.ops.geglu import _gelu_exact_f32

    gelu = _gelu_exact_f32(h1).astype(cdtype)
    o = jnp.dot(gelu, w2, preferred_element_type=jnp.float32)
    o = o + b2.astype(jnp.float32)
    return x1 + o.astype(cdtype)


def _post_kernel(a_ref, xr_ref, wproj_ref, bproj_ref, ln2s_ref, ln2b_ref,
                 w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, win, w, eps,
                 stat_dim):
    o_ref[0] = _post_body(
        a_ref[0], xr_ref[0], wproj_ref[...], bproj_ref[...],
        ln2s_ref[...], ln2b_ref[...], w1_ref[...], b1_ref[...],
        w2_ref[...], b2_ref[...], win=win, w=w, eps=eps, stat_dim=stat_dim)


def _post_ref(attn, xr, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2, h, w, win,
              stat_dim=0):
    b = xr.shape[0]
    cdtype = xr.dtype
    nwh = h // win
    rows = win * w
    a = attn.reshape(b * nwh, (w // win) * win * win, attn.shape[-1])
    xr2 = xr.reshape(b * nwh, rows, xr.shape[-1])
    out = jax.vmap(
        lambda aa, xx: _post_body(
            aa, xx, wproj.astype(cdtype), bproj, ln2s, ln2b,
            w1.astype(cdtype), b1, w2.astype(cdtype), b2,
            win=win, w=w, eps=1e-5, stat_dim=stat_dim)
    )(a, xr2)
    return out.reshape(b, h * w, xr.shape[-1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def swin_post(attn, xr, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2, h, w, win,
              stat_dim=0):
    """Window reverse + proj + residual + LN2 + MLP + residual (rolled space).

    Args:
      attn: (B, nW, win², C) attention output, image-major window order.
      xr: (B, L, C) rolled shortcut (``swin_pre``'s second output).
      weights fp32 as stored; GEMMs run in xr.dtype with f32 accumulation.
    Returns:
      (B, L, C) block output, still rolled by the block's shift.
    """
    b, l, c = xr.shape
    if not _use_kernel():
        return _post_ref(attn, xr, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
                         h, w, win, stat_dim)
    cdtype = xr.dtype
    nww, nwh = w // win, h // win
    rows = win * w
    hidden = w1.shape[-1]
    full = lambda: pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_post_kernel, win=win, w=w, eps=1e-5,
                          stat_dim=stat_dim),
        grid=(b, nwh),
        in_specs=[
            pl.BlockSpec((1, nww, win * win, c),
                         lambda i, j: (i * nwh + j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            full(), full(), full(), full(), full(), full(), full(), full(),
        ],
        out_specs=pl.BlockSpec((1, rows, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, l, c), cdtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * l * (c * c + 2 * c * hidden),
            bytes_accessed=2 * b * l * c * 3 + 2 * c * (c + 2 * hidden),
            transcendentals=b * l * hidden,  # exact-gelu erf
        ),
    )(attn.reshape(b * nwh, nww, win * win, c), xr,
      wproj.astype(cdtype), bproj.reshape(1, c),
      ln2s.reshape(1, c), ln2b.reshape(1, c),
      w1.astype(cdtype), b1.reshape(1, hidden),
      w2.astype(cdtype), b2.reshape(1, c))
    return out


def _post_fwd(attn, xr, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2, h, w, win,
              stat_dim):
    return swin_post(attn, xr, wproj, bproj, ln2s, ln2b, w1, b1, w2, b2,
                     h, w, win, stat_dim), (attn, xr, wproj, bproj, ln2s,
                                            ln2b, w1, b1, w2, b2)


def _post_bwd(h, w, win, stat_dim, res, g):
    _, vjp = jax.vjp(lambda *a: _post_ref(*a, h, w, win, stat_dim), *res)
    return vjp(g)


swin_post.defvjp(_post_fwd, _post_bwd)
