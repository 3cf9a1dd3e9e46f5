"""Shared fp32 LayerNorm math for the fused kernels.

One definition so the kernel/reference/golden-parity guarantees can't
drift between ops modules (torch ``nn.LayerNorm`` semantics: fp32 stats,
eps 1e-5, affine applied in fp32). ``models/layers.py:LayerNorm`` is the
module-path twin of this math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ln_f32(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
           eps: float = 1e-5) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps)) * scale + bias
