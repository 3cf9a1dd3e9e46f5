"""Fused GEGLU projection for the UNet transformer feed-forward (Pallas).

The LDM FeedForward (reference ``model/attention.py:20-33``) projects
(B, N, C) to 2·4C, splits, and multiplies ``h * gelu(gate)`` before the
down-projection. XLA materializes the full 2·4C intermediate in HBM
(write + read) plus the 4C product (write): at the flagship level shapes
(seq 4096×C320 / 1024×640 / 256×1280, bs8) that's ~40-170 MB of pure
intermediate traffic per FF call inside the denoise scan.

This kernel computes both column halves tile-by-tile in VMEM and writes
only the (B, N, 4C) product: traffic drops to x-read + weight-read +
product-write. The weights arrive pre-split (``wh``/``wg`` — the halves of
the packed ``proj`` kernel), so each grid cell contracts the SAME x tile
against matching column blocks of both halves.

Backward is XLA recompute via ``jax.custom_vjp`` over the reference math
(the EDTR train step differentiates through the UNet decoder half); CPU
dispatches to the reference directly. GELU is exact (erf), matching torch
``F.gelu``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edtr_tpu.ops import dispatch
from edtr_tpu.ops._norms import ln_f32 as _ln_f32

# test hook: force the Pallas path (interpret mode off-TPU)
_FORCE_KERNEL = False

_SEQ_TILE = 256
# 1280 divides every flagship inner dim (4C = 1280/2560/5120) and keeps the
# (C, cc) weight block + (TS, cc) f32 accumulator well under VMEM
_COL_TILE = 1280


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# per-grid-cell VMEM budget. The scoped limit on v5e is 16 MiB; r4 found
# the 256x1280->5120 flagship shape OOMing it at cc=1280 (16.33M measured
# by the compiler), so the column chunk now shrinks until the footprint
# fits with headroom for Mosaic's own scratch.
_VMEM_BUDGET = 12 * 2 ** 20


def _cell_bytes(c: int, cc: int) -> int:
    """Double-buffered bf16 blocks (x, wh, wg, out) + fp32 gelu scratch."""
    es = 2
    return (2 * es * (_SEQ_TILE * c + 2 * c * cc + _SEQ_TILE * cc)
            + 2 * 4 * _SEQ_TILE * cc)


def _col_tile(c: int, inner: int):
    """Largest column chunk dividing ``inner`` whose cell fits VMEM."""
    if inner <= _COL_TILE:
        return inner if _cell_bytes(c, inner) <= _VMEM_BUDGET else None
    cc = _COL_TILE
    while cc >= 128:
        if inner % cc == 0 and _cell_bytes(c, cc) <= _VMEM_BUDGET:
            return cc
        cc //= 2
    return None


def supported(seq: int, c: int, inner: int) -> bool:
    return seq % _SEQ_TILE == 0 and _col_tile(c, inner) is not None


def will_fuse(n: int, c: int, inner: int) -> bool:
    """True iff geglu_proj/ln_geglu_proj take the Pallas path at this
    shape: kernel tiling supports it AND the measured dispatch table says
    it wins there (ops/dispatch.py). The module-level structure choice
    (models/attention.py:FeedForward) consults the same predicate so the
    fallback is the exact legacy packed-GEMM graph, never a split-GEMM
    reference detour."""
    if _FORCE_KERNEL:
        return supported(n, c, inner)
    if jax.default_backend() != "tpu" or not supported(n, c, inner):
        return False
    return dispatch.decide("geglu", f"{n}x{c}->{inner}", n, c, inner)


def _erf_f32(x):
    """fp32 erf via Abramowitz & Stegun 7.1.26 (max abs err 1.5e-7).

    Mosaic has no erf/erfc lowering (probed on-chip); this polynomial uses
    only exp and stays ~50x below bf16 output resolution.
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu_exact_f32(x):
    return 0.5 * x * (1.0 + _erf_f32(x * (2.0 ** -0.5)))


def _geglu_tile(x, wh_ref, wg_ref, bh_ref, bg_ref, out_dtype):
    a = jnp.dot(x, wh_ref[...], preferred_element_type=jnp.float32)
    a = a + bh_ref[...].astype(jnp.float32)
    g = jnp.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    g = g + bg_ref[...].astype(jnp.float32)
    return (a * _gelu_exact_f32(g)).astype(out_dtype)


def _kernel(x_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref):
    o_ref[0] = _geglu_tile(x_ref[0], wh_ref, wg_ref, bh_ref, bg_ref,
                           o_ref.dtype)


def _ln_kernel(x_ref, s_ref, b_ref, wh_ref, wg_ref, bh_ref, bg_ref, o_ref):
    xln = _ln_f32(x_ref[0], s_ref[...], b_ref[...]).astype(x_ref.dtype)
    o_ref[0] = _geglu_tile(xln, wh_ref, wg_ref, bh_ref, bg_ref, o_ref.dtype)


def _ref(x, wh, wg, bh, bg):
    cdtype = x.dtype
    a = jnp.dot(x, wh.astype(cdtype), preferred_element_type=jnp.float32)
    a = a + bh.astype(jnp.float32)
    g = jnp.dot(x, wg.astype(cdtype), preferred_element_type=jnp.float32)
    g = g + bg.astype(jnp.float32)
    return (a * jax.nn.gelu(g, approximate=False)).astype(cdtype)


@jax.custom_vjp
def geglu_proj(x, wh, wg, bh, bg):
    """``h * gelu(gate)`` where ``h = x@wh + bh``, ``gate = x@wg + bg``.

    Args:
      x: (B, N, C) tokens in compute dtype.
      wh/wg: (C, inner) fp32 halves of the packed GEGLU ``proj`` kernel
        (cast to x.dtype for the GEMMs). bh/bg: (inner,) fp32.
    Returns:
      (B, N, inner) in x.dtype.
    """
    b, n, c = x.shape
    inner = wh.shape[-1]
    if not will_fuse(n, c, inner):
        return _ref(x, wh, wg, bh, bg)
    cdtype = x.dtype
    ts = _SEQ_TILE
    cc = _col_tile(c, inner)
    grid = (b, n // ts, inner // cc)
    w_spec = pl.BlockSpec((c, cc), lambda i, s, j: (0, j),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cc), lambda i, s, j: (0, j),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ts, c), lambda i, s, j: (i, s, 0),
                         memory_space=pltpu.VMEM),
            w_spec, w_spec, b_spec, b_spec,
        ],
        out_specs=pl.BlockSpec((1, ts, cc), lambda i, s, j: (i, s, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, inner), cdtype),
        interpret=_interpret(),
        # declare the two GEMMs' flops for XLA cost analysis (bench MFU)
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * c * inner,
            bytes_accessed=2 * (b * n * (c * (inner // cc) + inner)
                                + 2 * c * inner),
            transcendentals=b * n * inner,
        ),
    )(x, wh.astype(cdtype), wg.astype(cdtype),
      bh.reshape(1, inner), bg.reshape(1, inner))


def _fwd(x, wh, wg, bh, bg):
    return geglu_proj(x, wh, wg, bh, bg), (x, wh, wg, bh, bg)


def _bwd(res, g):
    _, vjp = jax.vjp(_ref, *res)
    return vjp(g)


geglu_proj.defvjp(_fwd, _bwd)


def _ln_ref(x, ln_s, ln_b, wh, wg, bh, bg):
    return _ref(_ln_f32(x, ln_s, ln_b).astype(x.dtype), wh, wg, bh, bg)


@jax.custom_vjp
def ln_geglu_proj(x, ln_s, ln_b, wh, wg, bh, bg):
    """:func:`geglu_proj` with the block's norm3 LayerNorm absorbed.

    ``x`` is the PRE-norm residual stream; the normalized tokens never
    touch HBM (LN is row-local, recomputed per column chunk).
    """
    b, n, c = x.shape
    inner = wh.shape[-1]
    if not will_fuse(n, c, inner):
        return _ln_ref(x, ln_s, ln_b, wh, wg, bh, bg)
    cdtype = x.dtype
    ts = _SEQ_TILE
    cc = _col_tile(c, inner)
    grid = (b, n // ts, inner // cc)
    w_spec = pl.BlockSpec((c, cc), lambda i, s, j: (0, j),
                          memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, cc), lambda i, s, j: (0, j),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _ln_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ts, c), lambda i, s, j: (i, s, 0),
                         memory_space=pltpu.VMEM),
            full, full, w_spec, w_spec, b_spec, b_spec,
        ],
        out_specs=pl.BlockSpec((1, ts, cc), lambda i, s, j: (i, s, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, inner), cdtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * n * c * inner,
            bytes_accessed=2 * (b * n * (c * (inner // cc) + inner)
                                + 2 * c * inner),
            transcendentals=b * n * inner,
        ),
    )(x, ln_s.reshape(1, c), ln_b.reshape(1, c),
      wh.astype(cdtype), wg.astype(cdtype),
      bh.reshape(1, inner), bg.reshape(1, inner))


def _ln_fwd(x, ln_s, ln_b, wh, wg, bh, bg):
    return ln_geglu_proj(x, ln_s, ln_b, wh, wg, bh, bg), (
        x, ln_s, ln_b, wh, wg, bh, bg)


def _ln_bwd(res, g):
    _, vjp = jax.vjp(_ln_ref, *res)
    return vjp(g)


ln_geglu_proj.defvjp(_ln_fwd, _ln_bwd)
