"""Fused LayerNorm + projection GEMMs for transformer blocks (Pallas).

Every BasicTransformerBlock op sequence starts ``LayerNorm(x) @ W...``:
norm1 feeds the self-attention q/k/v projections (three GEMMs over the
same normalized tokens), norm2 feeds the cross-attention query. XLA
materializes the normalized tensor in HBM between the reduction and the
GEMMs (w+r of the full token tensor per LN — the same pathology measured
at ~7x off roofline for SwinIR's LayerNorms before ops/swin_block.py).

``ln_matmuls`` normalizes each (TS, C) row tile in VMEM and contracts it
against K weight matrices in one kernel — the normalized tokens never
touch HBM. The LN is recomputed per output-column chunk (VPU work, free
next to the MXU dots).

Backward is XLA recompute via ``jax.custom_vjp`` over the reference math
(the EDTR train step differentiates through the UNet decoder half); CPU
dispatches to the reference. Matches torch LayerNorm semantics (fp32
stats, eps 1e-5) and bias-free projections (CrossAttention's to_q/k/v,
``model/attention.py:60-66``).
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
_MAX_OUT_TILE = 640


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _out_tile(o: int) -> int:
    if o <= _MAX_OUT_TILE:
        return o
    for t in range(_MAX_OUT_TILE, 0, -1):
        if o % t == 0:
            return t
    return o  # pragma: no cover


def supported(seq: int) -> bool:
    return seq % _SEQ_TILE == 0


def _will_fuse_ln(n: int, c: int, o: int, k: int) -> bool:
    """Dispatch for :func:`ln_matmuls` — supported shape AND a measured
    win (ops/dispatch.py; K=1 q-only projections amortize nothing and lose
    everywhere measured)."""
    if _FORCE_KERNEL:
        return supported(n)
    if jax.default_backend() != "tpu" or not supported(n):
        return False
    return dispatch.decide("ln_matmul", f"{n}x{c}->{o}x{k}", n, c, o, k)


def _will_fuse_affine(n: int, c: int, o: int) -> bool:
    if _FORCE_KERNEL:
        return supported(n)
    if jax.default_backend() != "tpu" or not supported(n):
        return False
    return dispatch.decide("affine_matmul", f"{n}x{c}->{o}", n, c, o)


def _kernel(x_ref, s_ref, b_ref, *rest, n_w):
    w_refs, o_refs = rest[:n_w], rest[n_w:]
    xln = _ln_f32(x_ref[0], s_ref[...], b_ref[...]).astype(x_ref.dtype)
    for w_ref, o_ref in zip(w_refs, o_refs):
        o_ref[0] = jnp.dot(
            xln, w_ref[...], preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _ref(x, ln_s, ln_b, *ws):
    cdtype = x.dtype
    xln = _ln_f32(x, ln_s, ln_b).astype(cdtype)
    return tuple(
        jnp.dot(xln, w.astype(cdtype),
                preferred_element_type=jnp.float32).astype(cdtype)
        for w in ws)


@jax.custom_vjp
def ln_matmuls(x, ln_s, ln_b, *ws):
    """``tuple(LN(x) @ w for w in ws)`` with the LN kept in VMEM.

    Args:
      x: (B, N, C) tokens in compute dtype.
      ln_s/ln_b: (C,) fp32 LayerNorm affine (torch semantics, eps 1e-5).
      ws: K fp32 weight matrices, each (C, O) with the SAME O
        (cast to x.dtype for the GEMMs; projections are bias-free).
    Returns:
      K arrays (B, N, O) in x.dtype.
    """
    b, n, c = x.shape
    o = ws[0].shape[-1]
    if not (all(w.shape == (c, o) for w in ws)
            and _will_fuse_ln(n, c, o, len(ws))):
        return _ref(x, ln_s, ln_b, *ws)
    cdtype = x.dtype
    ts = _SEQ_TILE
    oc = _out_tile(o)
    grid = (b, n // ts, o // oc)
    w_spec = pl.BlockSpec((c, oc), lambda i, s, j: (0, j),
                          memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, ts, oc), lambda i, s, j: (i, s, j),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, n_w=len(ws)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ts, c), lambda i, s, j: (i, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ] + [w_spec] * len(ws),
        out_specs=[out_spec] * len(ws),
        out_shape=[jax.ShapeDtypeStruct((b, n, o), cdtype)] * len(ws),
        interpret=_interpret(),
        # declare the K GEMMs' flops for XLA cost analysis (bench MFU)
        cost_estimate=pl.CostEstimate(
            flops=2 * len(ws) * b * n * c * o,
            bytes_accessed=2 * (b * n * (c * (o // oc) + len(ws) * o)
                                + len(ws) * c * o),
            transcendentals=0,
        ),
    )(x, ln_s.reshape(1, c), ln_b.reshape(1, c),
      *[w.astype(cdtype) for w in ws])
    return tuple(outs)


def _fwd(x, ln_s, ln_b, *ws):
    return ln_matmuls(x, ln_s, ln_b, *ws), (x, ln_s, ln_b) + ws


def _bwd(res, g):
    _, vjp = jax.vjp(_ref, *res)
    return vjp(g)


ln_matmuls.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# affine (folded GroupNorm) + projection — the SpatialTransformer entry
# ---------------------------------------------------------------------------


def _aff_kernel(x_ref, m_ref, a_ref, w_ref, b_ref, o_ref):
    xa = (x_ref[0].astype(jnp.float32) * m_ref[0]
          + a_ref[0]).astype(x_ref.dtype)
    o = jnp.dot(xa, w_ref[...], preferred_element_type=jnp.float32)
    o_ref[0] = o.astype(o_ref.dtype) + b_ref[...].astype(o_ref.dtype)


def _aff_ref(x, mul, add, w, b):
    cdtype = x.dtype
    xa = (x.astype(jnp.float32) * mul[:, None, :]
          + add[:, None, :]).astype(cdtype)
    o = jnp.dot(xa, w.astype(cdtype), preferred_element_type=jnp.float32)
    return o.astype(cdtype) + b.astype(cdtype)


@jax.custom_vjp
def affine_matmul(x, mul, add, w, b):
    """``((x*mul + add) @ w) + b`` with the affine kept in VMEM.

    The SpatialTransformer entry (reference ``model/attention.py:283-295``)
    is GroupNorm -> proj_in: the norm folds to a per-(B, C) affine outside
    (ops/gn_conv.py:gn_fold) and applies here inside the GEMM tile, so the
    normalized tokens never round-trip HBM.

    Args:
      x: (B, N, C) tokens in compute dtype.
      mul/add: (B, C) fp32 folded GroupNorm affine.
      w: (C, O) fp32 kernel; b: (O,) fp32 bias (adds in compute dtype,
        matching flax Dense).
    Returns:
      (B, N, O) in x.dtype.
    """
    bsz, n, c = x.shape
    o = w.shape[-1]
    if not _will_fuse_affine(n, c, o):
        return _aff_ref(x, mul, add, w, b)
    cdtype = x.dtype
    ts = _SEQ_TILE
    oc = _out_tile(o)
    grid = (bsz, n // ts, o // oc)
    return pl.pallas_call(
        _aff_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ts, c), lambda i, s, j: (i, s, 0),
                         memory_space=pltpu.VMEM),
            # (B, 1, C) with a (1, 1, C) block: a 2-D (1, C) block over a
            # (B, C) array violates Mosaic's sublane rule (second-to-last
            # block dim must divide 8 or equal the array dim)
            pl.BlockSpec((1, 1, c), lambda i, s, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, s, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, oc), lambda i, s, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, oc), lambda i, s, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ts, oc), lambda i, s, j: (i, s, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, o), cdtype),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * n * c * o,
            bytes_accessed=2 * (bsz * n * (c * (o // oc) + o) + c * o),
            transcendentals=0,
        ),
    )(x, mul.reshape(bsz, 1, c), add.reshape(bsz, 1, c),
      w.astype(cdtype), b.reshape(1, o))


def _aff_fwd(x, mul, add, w, b):
    return affine_matmul(x, mul, add, w, b), (x, mul, add, w, b)


def _aff_bwd(res, g):
    _, vjp = jax.vjp(_aff_ref, *res)
    return vjp(g)


affine_matmul.defvjp(_aff_fwd, _aff_bwd)
