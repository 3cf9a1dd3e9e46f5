"""Attention compute primitives for TPU.

The reference selects between vanilla-einsum / xformers / SDPA at import time
(``model/attention.py:54-211``, ``model/config.py:35-60``); all three compute
the same softmax(QK^T * scale) V with fp32-forced logits. Here there is one
semantic op with two interchangeable backends:

* ``xla``   — einsum with fp32 logit accumulation; XLA fuses this well and it
              is the numerics oracle;
* ``flash`` — Pallas kernels (see ``edtr_tpu.ops.flash_attention``): a
              blockwise online-softmax kernel for seq >= 2048 and a
              whole-sequence VMEM kernel for 512..1024 — engaged when shapes
              qualify (self-attention, head_dim <= 128); per-level
              measurements in tools/bench_attention.py.

Layout: ``(batch, seq, heads, head_dim)`` throughout (TPU-friendly: the last
dim stays the 128-lane axis after head folding).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_BACKEND = os.environ.get("EDTR_ATTN_MODE", "auto")  # auto | xla | flash


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("auto", "xla", "flash")
    _BACKEND = name


def _xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    # fp32 logits + softmax regardless of input dtype: the TPU equivalent of
    # the reference's ATTN_PRECISION=fp32 forcing (model/attention.py:84-91).
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
    )
    logits = logits.astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
    return out


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: Optional[float] = None,
    bias: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """softmax(q k^T * scale + bias) v with fp32 softmax.

    Args:
      q: (B, Nq, H, D)
      k/v: (B, Nk, H, D)
      bias: optional additive logit bias broadcastable to (B, H, Nq, Nk)
    Returns:
      (B, Nq, H, D) in v.dtype.
    """
    if scale is None:
        scale = q.shape[-1] ** -0.5
    backend = _BACKEND
    if bias is None and backend in ("auto", "flash"):
        try:
            from edtr_tpu.ops.flash_attention import (
                flash_attention,
                shapes_supported,
            )

            if shapes_supported(q, k, v) and (
                backend == "flash" or _on_tpu()
            ):
                return flash_attention(q, k, v, scale)
        except ImportError:
            pass
    return _xla_attention(q, k, v, scale, bias)


def _on_tpu() -> bool:
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False
