"""Blockwise (flash) attention forward in Pallas for TPU.

The hot UNet/ControlNet attention shapes at 512² EDTR (SURVEY.md §7 step 5)
are self-attention with seq 4096/1024/256 and head_dim 64, plus 77-token
cross-attention. The XLA path materializes (N, N) logits per head in HBM;
this kernel streams KV blocks through VMEM with an online softmax, so HBM
traffic drops from O(N²) to O(N·D) — the standard flash-attention recipe
(blockwise max/denominator carried in VMEM scratch).

Backward: a ``jax.custom_vjp`` that recomputes attention with the XLA path —
training wraps blocks in remat anyway, and the frozen-UNet inference path
(the EDTR hot loop) never differentiates through here.

Grid: (batch*heads, num_q_blocks); the KV loop runs inside the kernel via
``jax.lax.fori_loop`` over VMEM-resident K/V (loaded whole per (b,h) —
N≤4096 × D=64 fp32 = 1 MB each, well under the 16 MB VMEM budget).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Q_BLOCK = 512
KV_BLOCK = 512
NEG_INF = -1e30


def shapes_supported(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> bool:
    """(B, N, H, D) with N_q divisible by Q_BLOCK, N_kv by KV_BLOCK, D<=128."""
    if q.ndim != 4 or k.shape != v.shape:
        return False
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # measured on v5e: flash wins at long seq (1.9x @4096); XLA's fused
    # attention is faster below ~2k where the O(N^2) HBM traffic is small
    return (
        d <= 128
        and nq % Q_BLOCK == 0
        and nk % KV_BLOCK == 0
        and nq >= 2048
        and nk >= 2048
    )


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    q = q_ref[0].astype(jnp.float32) * scale  # (Q_BLOCK, D)
    num_kv = kv_len // KV_BLOCK

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, pl.ds(i * KV_BLOCK, KV_BLOCK), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(i * KV_BLOCK, KV_BLOCK), :].astype(jnp.float32)
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (Qb, Kb)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        return acc, m_new, l_new

    d = q_ref.shape[-1]
    acc = jnp.zeros((q.shape[0], d), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float):
    b, nq, h, d = q.shape
    nk = k.shape[1]
    # (B, N, H, D) -> (B*H, N, D)
    qf = q.transpose(0, 2, 1, 3).reshape(b * h, nq, d)
    kf = k.transpose(0, 2, 1, 3).reshape(b * h, nk, d)
    vf = v.transpose(0, 2, 1, 3).reshape(b * h, nk, d)

    grid = (b * h, nq // Q_BLOCK)
    interpret = jax.default_backend() == "cpu"  # CPU tests run interpreted
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=nk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Q_BLOCK, d), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, nq, d), v.dtype),
        interpret=interpret,
    )(qf, kf, vf)
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention(q, k, v, scale: float):
    return _flash_forward(q, k, v, scale)


def _fwd(q, k, v, scale):
    return _flash_forward(q, k, v, scale), (q, k, v)


def _bwd(scale, residuals, g):
    # recompute with the XLA reference path and differentiate through it
    from edtr_tpu.ops.attention import _xla_attention

    q, k, v = residuals
    _, vjp = jax.vjp(lambda q_, k_, v_: _xla_attention(q_, k_, v_, scale), q, k, v)
    return vjp(g)


flash_attention.defvjp(_fwd, _bwd)
