"""Blockwise (flash) + whole-sequence attention in Pallas for TPU.

The hot UNet/ControlNet attention shapes at 512² EDTR (SURVEY.md §7 step 5)
are self-attention with seq 4096/1024/256 and head_dim 64, plus 77-token
cross-attention. The XLA path materializes (N, N) logits per head in HBM.
Two Pallas regimes replace it (dispatch in :func:`shapes_supported` /
``WHOLE_SEQ_MAX``, measured by tools/bench_attention.py):

* **N >= 2048** — classic flash: KV blocks stream through VMEM with an
  online softmax; HBM traffic drops from O(N²) to O(N·D).
* **512 <= N <= 1024** — whole-sequence VMEM kernel: S = QKᵀ (≤4 MB fp32)
  lives entirely in VMEM, one grid row per (batch, head); plain softmax, no
  online bookkeeping, zero logits HBM traffic. This is the UNet's ds=2
  level (seq 1024, 10 heads), where XLA's fused attention was
  bandwidth-bound on the logits round-trip.

Backward is the flash recipe too (not XLA recompute): the forward saves the
per-query logsumexp L; the VJP computes D = rowsum(dO·O) with XLA, then two
Pallas kernels produce dQ (grid over query blocks) and dK/dV (grid over KV
blocks), each re-materializing probability blocks in VMEM from Q·K and L —
so training sees the same O(N·D) HBM traffic as inference.

Grid: (batch*heads, num_blocks); K/V (or Q/dO) are VMEM-resident whole per
(b,h) — N≤4096 × D=64 fp32 ≈ 1 MB each, well under the 16 MB VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 512
# 1024-wide KV passes measured fastest at the ds=1 level (tools/
# sweep_flash_blocks.py: 3.35 ms vs 3.53 at 512/512 for (8,4096,5,64));
# wider KV amortizes the online-softmax rescale per pass. The d=64
# contraction caps the MXU near 50% either way — block size is not the
# remaining limiter.
KV_BLOCK = 1024
NEG_INF = -1e30

# below this length a WHOLE-SEQUENCE VMEM kernel replaces the blockwise one:
# S (N², fp32) fits in VMEM (1024² = 4 MB), so one grid row per (b,h)
# computes softmax(QKᵀ)V with ZERO logits HBM traffic and no online-softmax
# bookkeeping. XLA's attention at these sizes round-trips the N² logits
# through HBM (~16 MB/head @1024), which made it bandwidth-bound; the UNet's
# 1024-token level (ds=2) is exactly here (VERDICT r2 weak #7).
WHOLE_SEQ_MAX = 1024
# measured floor (tools/bench_attention.py): at 256 tokens the logits are
# tiny and XLA's fusion wins on dispatch overhead
MIN_SEQ = 512


def shapes_supported(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """(B, N, H, D) self-attention shapes the Pallas kernels accept.

    Wide heads (D up to 512 — the VAE mid-attention is single-head D=512 at
    4096 tokens, model/vae.py:127-323) take the blockwise kernel as long as
    the whole-KV VMEM residency fits (~8 MB for K+V); the whole-sequence
    kernel stays D<=128 (its S block is the VMEM budget).
    """
    if q.ndim != 4 or k.shape != v.shape:
        return False
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if nq != nk:
        return False
    if d > 128:
        # wide heads go through the STREAMED-KV kernel (KV blocks arrive via
        # the grid, not whole-KV residency — whole-KV at D=512/N=4096 bf16 is
        # 8 MB which double-buffers past the 16 MB VMEM limit)
        if d > 512 or d % 128 != 0:
            return False
        return nq >= 2048 and nq % Q_BLOCK == 0 and nk % KV_BLOCK == 0
    if nq >= 2048:
        return nq % Q_BLOCK == 0 and nk % KV_BLOCK == 0
    return nq >= MIN_SEQ and nq % 128 == 0


def _interpret() -> bool:
    return jax.default_backend() == "cpu"  # CPU tests run interpreted


# =============================================================================
# forward
# =============================================================================

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float, kv_len: int):
    # MXU dtype discipline (mirrors the XLA oracle, ops/attention.py):
    # matmuls run on the INPUT dtype with fp32 accumulation — bf16 inputs get
    # the native bf16 MXU rate (an up-front .astype(f32) forced fp32
    # multi-pass matmuls, ~33% MFU in the r3 trace); softmax math stays fp32
    # (scale applied to the f32 logits, probabilities cast to v.dtype for PV).
    q = q_ref[0]  # (Qb, D), native dtype
    num_kv = kv_len // KV_BLOCK

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * KV_BLOCK, KV_BLOCK), :]
        v_blk = v_ref[0, pl.ds(i * KV_BLOCK, KV_BLOCK), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(
            p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc = jnp.zeros((q.shape[0], d), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)
    l_ref[0] = m + jnp.log(l)  # (Qb, 1) logsumexp per query


def _flash_fwd_flat(qf, kf, vf, scale: float):
    """(BH, Nq, D) x (BH, Nk, D)² -> (out (BH, Nq, D), lse (BH, Nq))."""
    bh, nq, d = qf.shape
    nk = kf.shape[1]
    grid = (bh, nq // Q_BLOCK)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, kv_len=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            # (bh, nq, 1): a trailing singleton lane keeps the TPU block
            # rules happy (block dims must divide (8,128) or equal the array)
            pl.BlockSpec((1, Q_BLOCK, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), vf.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf)


# =============================================================================
# q-blocked whole-KV forward (2048 <= N <= 4096, D <= 128)
# =============================================================================

# S slab fp32 (QB, N) at QB=256, N=4096 is 4 MB; with K/V whole-resident
# (0.5 MB bf16 each) and the bf16 probability copy this stays ~8 MB
Q_BLOCK_WHOLEKV = 256


def _qblock_wholekv_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float):
    """Full-row softmax per q block: K/V live whole in VMEM, so no online
    rescale and no fori bookkeeping — each cell is two clean MXU dots and
    one fp32 softmax. Built for the UNet's ds=1 level (seq 4096, d 64),
    where the online-softmax kernel measured 0.305 MFU against the d=64
    contraction cap of ~0.5: the acc-rescale (alpha) multiplies and the
    per-KV-block max/sum passes were the gap (round-5 roofline)."""
    q, k, v = q_ref[0], k_ref[0], v_ref[0]            # native dtype
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (QB, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = (jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                / l).astype(o_ref.dtype)
    l_ref[0] = m + jnp.log(l)


def _qblock_wholekv_fwd_flat(qf, kf, vf, scale: float):
    bh, nq, d = qf.shape
    nk = kf.shape[1]
    qb = Q_BLOCK_WHOLEKV
    kv_spec = pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_qblock_wholekv_kernel, scale=scale),
        grid=(bh, nq // qb),
        in_specs=[
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            kv_spec, kv_spec,
        ],
        out_specs=[
            pl.BlockSpec((1, qb, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), vf.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf)


def _bigseq_variant() -> str:
    """Forward kernel for the 2048..4096 self-attention regime:
    'online' or 'wholekv' (``$EDTR_FLASH_BIGSEQ``). Default 'wholekv' per
    the round-4 two-measurement protocol: it wins standalone at the seq-4096
    flagship core (2.70 vs 2.92 ms, roofline_scan.json attn_core) AND e2e on
    the full scan stage (37.13 vs 37.63 ms/img at 20 iters, bit-identical
    outputs — results/chip_queue/ab_scan_r5.json, 2026-08-20)."""
    import os

    return os.environ.get("EDTR_FLASH_BIGSEQ", "wholekv")


# =============================================================================
# streamed-KV forward (wide heads, 128 < D <= 512)
# =============================================================================

def _fwd_kernel_streamkv(q_ref, k_ref, v_ref, o_ref, l_ref,
                         acc_ref, m_ref, s_ref, *, scale: float, num_kv: int):
    """Flash forward with KV blocks delivered BY THE GRID (innermost dim).

    The VAE mid-attention (single head, D=512, N=4096 at 512² —
    /root/reference/model/vae.py:127-323) cannot keep whole K/V VMEM-resident
    like :func:`_fwd_kernel` does (2×4 MB bf16, doubled by Pallas input
    double-buffering → >16 MB). Here each grid cell sees ONE (KV_BLOCK, D)
    slab of K and V; the online-softmax state (acc, m, l) lives in VMEM
    scratch, which persists across the sequential kv iterations of a given
    (bh, q_block) row on TPU. Residency per cell: acc 1 MB (f32, D=512) +
    three double-buffered 0.5 MB slabs ≈ 4.5 MB.
    """
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        s_ref[...] = jnp.zeros_like(s_ref)

    q, k_blk, v_blk = q_ref[0], k_ref[0], v_ref[0]      # native dtype
    s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
    m_prev, l_prev = m_ref[...], s_ref[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    s_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
        p.astype(v_blk.dtype), v_blk, preferred_element_type=jnp.float32)
    m_ref[...] = m_new

    @pl.when(kv_i == num_kv - 1)
    def _flush():
        l = s_ref[...]
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)
        l_ref[0] = m_ref[...] + jnp.log(l)


def _streamkv_fwd_flat(qf, kf, vf, scale: float):
    bh, nq, d = qf.shape
    nk = kf.shape[1]
    num_kv = nk // KV_BLOCK
    return pl.pallas_call(
        functools.partial(_fwd_kernel_streamkv, scale=scale, num_kv=num_kv),
        grid=(bh, nq // Q_BLOCK, num_kv),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j, m: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV_BLOCK, d), lambda i, j, m: (i, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV_BLOCK, d), lambda i, j, m: (i, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j, m: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, 1), lambda i, j, m: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), vf.dtype),
            jax.ShapeDtypeStruct((bh, nq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((Q_BLOCK, d), jnp.float32),
            pltpu.VMEM((Q_BLOCK, 1), jnp.float32),
            pltpu.VMEM((Q_BLOCK, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf)


def _xla_bwd_flat(qf, kf, vf, dof, lse, dd, scale: float):
    """Wide-head backward: plain XLA from the saved logsumexp.

    Only reachable through ``train_decoder`` recipes (the VAE encode side is
    stop-gradient'd in the EDTR step); the N² probability tensor lives in
    HBM here, which is fine for the training path.
    """
    f32 = jnp.float32
    s = jnp.einsum("bqd,bkd->bqk", qf, kf, preferred_element_type=f32) * scale
    p = jnp.exp(s - lse)                                  # (bh, nq, nk) f32
    dv = jnp.einsum("bqk,bqd->bkd", p.astype(dof.dtype), dof,
                    preferred_element_type=f32).astype(vf.dtype)
    dp = jnp.einsum("bqd,bkd->bqk", dof, vf, preferred_element_type=f32)
    ds = (p * (dp - dd)).astype(qf.dtype)
    dq = (jnp.einsum("bqk,bkd->bqd", ds, kf, preferred_element_type=f32)
          * scale).astype(qf.dtype)
    dk = (jnp.einsum("bqk,bqd->bkd", ds, qf, preferred_element_type=f32)
          * scale).astype(kf.dtype)
    return dq, dk, dv


# =============================================================================
# whole-sequence VMEM kernels (N <= WHOLE_SEQ_MAX)
# =============================================================================

def _whole_fwd_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, *, scale: float):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]             # native dtype
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale  # (N, N)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o_ref[0] = (jnp.dot(p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                / l).astype(o_ref.dtype)
    l_ref[0] = m + jnp.log(l)


def _whole_bwd_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]  # native dtype
    lse = l_ref[0]
    dd = dd_ref[0]
    s = jnp.dot(q, k.T, preferred_element_type=jnp.float32) * scale
    p = jnp.exp(s - lse)                               # (N, N) fp32
    p_lo = p.astype(v.dtype)
    dv_ref[0] = jnp.dot(p_lo.T, do, preferred_element_type=jnp.float32).astype(
        dv_ref.dtype)
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = (p * (dp - dd)).astype(q.dtype)
    dq_ref[0] = (jnp.dot(ds, k, preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32)
                 * scale).astype(dk_ref.dtype)


def _whole_fwd_flat(qf, kf, vf, scale: float):
    bh, n, d = qf.shape
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_whole_fwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec],
        out_specs=[spec, lspec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), vf.dtype),
            jax.ShapeDtypeStruct((bh, n, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(qf, kf, vf)


def _whole_bwd_flat(qf, kf, vf, dof, lse, dd, scale: float):
    bh, n, d = qf.shape
    spec = pl.BlockSpec((1, n, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, n, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_whole_bwd_kernel, scale=scale),
        grid=(bh,),
        in_specs=[spec, spec, spec, spec, lspec, lspec],
        out_specs=[spec, spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n, d), qf.dtype),
            jax.ShapeDtypeStruct((bh, n, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, n, d), vf.dtype),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, dd)


# =============================================================================
# backward
# =============================================================================

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref, dq_ref,
               *, scale: float, kv_len: int):
    q = q_ref[0]                                      # (Qb, D) native dtype
    do = do_ref[0]
    lse = l_ref[0]                                    # (Qb, 1)
    dd = dd_ref[0]                                    # (Qb, 1)
    num_kv = kv_len // KV_BLOCK

    def body(i, dq):
        k_blk = k_ref[0, pl.ds(i * KV_BLOCK, KV_BLOCK), :]
        v_blk = v_ref[0, pl.ds(i * KV_BLOCK, KV_BLOCK), :]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                          # softmax probs block
        dp = jnp.dot(do, v_blk.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - dd)).astype(k_blk.dtype)
        return dq + jnp.dot(ds, k_blk, preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(
        0, num_kv, body, jnp.zeros((q.shape[0], q.shape[1]), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, l_ref, dd_ref, dk_ref, dv_ref,
                *, scale: float, q_len: int):
    k_blk = k_ref[0]                                  # (Kb, D) native dtype
    v_blk = v_ref[0]
    num_q = q_len // Q_BLOCK
    d = k_blk.shape[-1]

    def body(i, carry):
        dk, dv = carry
        q_blk = q_ref[0, pl.ds(i * Q_BLOCK, Q_BLOCK), :]
        do_blk = do_ref[0, pl.ds(i * Q_BLOCK, Q_BLOCK), :]
        lse = l_ref[0, pl.ds(i * Q_BLOCK, Q_BLOCK), :]   # (Qb, 1)
        dd = dd_ref[0, pl.ds(i * Q_BLOCK, Q_BLOCK), :]
        s = jnp.dot(q_blk, k_blk.T, preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - lse)                          # (Qb, Kb) fp32
        dv = dv + jnp.dot(p.astype(do_blk.dtype).T, do_blk,
                          preferred_element_type=jnp.float32)
        dp = jnp.dot(do_blk, v_blk.T, preferred_element_type=jnp.float32)
        ds = (p * (dp - dd)).astype(q_blk.dtype)
        dk = dk + jnp.dot(ds.T, q_blk, preferred_element_type=jnp.float32)
        return dk, dv

    dk0 = jnp.zeros((k_blk.shape[0], d), jnp.float32)
    dv0 = jnp.zeros((k_blk.shape[0], d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd_flat(qf, kf, vf, dof, lse, dd, scale: float):
    bh, nq, d = qf.shape
    nk = kf.shape[1]
    dq = pl.pallas_call(
        functools.partial(_dq_kernel, scale=scale, kv_len=nk),
        grid=(bh, nq // Q_BLOCK),
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q_BLOCK, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), qf.dtype),
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, dd)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, scale=scale, q_len=nq),
        grid=(bh, nk // KV_BLOCK),
        in_specs=[
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nq, 1), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, KV_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KV_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nk, d), kf.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), vf.dtype),
        ],
        interpret=_interpret(),
    )(qf, kf, vf, dof, lse, dd)
    return dq, dk, dv


# =============================================================================
# public API: (B, N, H, D) custom-vjp
# =============================================================================

def _to_flat(x):
    b, n, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)


def _from_flat(xf, b, h):
    bh, n, d = xf.shape
    return xf.reshape(b, h, n, d).transpose(0, 2, 1, 3)


def _whole(n: int, d: int) -> bool:
    return n <= WHOLE_SEQ_MAX and d <= 128


def _fwd_flat_dispatch(qf, kf, vf, scale):
    n, d = qf.shape[1], qf.shape[2]
    if d > 128:
        return _streamkv_fwd_flat(qf, kf, vf, scale)
    if _whole(n, d):
        return _whole_fwd_flat(qf, kf, vf, scale)
    if (n <= 4096 and n % Q_BLOCK_WHOLEKV == 0
            and _bigseq_variant() == "wholekv"):
        return _qblock_wholekv_fwd_flat(qf, kf, vf, scale)
    return _flash_fwd_flat(qf, kf, vf, scale)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    qf, kf, vf = _to_flat(q), _to_flat(k), _to_flat(v)
    out, _ = _fwd_flat_dispatch(qf, kf, vf, scale)
    return _from_flat(out, q.shape[0], q.shape[2])


def _fwd(q, k, v, scale):
    b, h = q.shape[0], q.shape[2]
    qf, kf, vf = _to_flat(q), _to_flat(k), _to_flat(v)
    of, lse = _fwd_flat_dispatch(qf, kf, vf, scale)
    return _from_flat(of, b, h), (qf, kf, vf, of, lse, b, h)


def _bwd(scale, residuals, g):
    qf, kf, vf, of, lse, b, h = residuals
    dof = _to_flat(g)
    # D_i = sum_d dO_i O_i — the softmax-jacobian row correction
    dd = jnp.sum(dof.astype(jnp.float32) * of.astype(jnp.float32),
                 axis=-1, keepdims=True)  # (bh, nq, 1)
    if qf.shape[2] > 128:
        dqf, dkf, dvf = _xla_bwd_flat(qf, kf, vf, dof, lse, dd, scale)
    elif _whole(qf.shape[1], qf.shape[2]):
        dqf, dkf, dvf = _whole_bwd_flat(qf, kf, vf, dof, lse, dd, scale)
    else:
        dqf, dkf, dvf = _flash_bwd_flat(qf, kf, vf, dof, lse, dd, scale)
    return (_from_flat(dqf, b, h), _from_flat(dkf, b, h), _from_flat(dvf, b, h))


flash_attention.defvjp(_fwd, _bwd)
