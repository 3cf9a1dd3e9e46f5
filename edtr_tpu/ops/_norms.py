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
           eps: float = 1e-5, stat_dim: int = 0) -> jnp.ndarray:
    """``stat_dim`` > 0: lane-padded statistics — the trailing
    ``C - stat_dim`` channels are guaranteed-zero padding (SwinIR 180->192
    lane alignment, models/swinir.py), so the raw sums over all C channels
    equal the real sums and only the divisor changes. The raw-moment form
    (E[x²] - μ²) is required: the centered form would count pad_count·μ²
    into the variance."""
    xf = x.astype(jnp.float32)
    if stat_dim and stat_dim != x.shape[-1]:
        n = float(stat_dim)
        mean = jnp.sum(xf, axis=-1, keepdims=True) / n
        var = jnp.sum(xf * xf, axis=-1, keepdims=True) / n - mean * mean
        return ((xf - mean) * jax.lax.rsqrt(var + eps)) * scale + bias
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    d = xf - mean
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return (d * jax.lax.rsqrt(var + eps)) * scale + bias
