"""Fail-safe probe for the optional fused Pallas kernels.

The fused swin-block and GEGLU kernels (ops/swin_block.py, ops/geglu.py)
are default-on on TPU with pure-XLA reference fallbacks selected at
dispatch time. A Mosaic lowering regression (new jaxlib, new TPU
generation) would otherwise surface as a compile failure in the middle of
a big model build; entry points that must never hard-fail (bench.py,
``__graft_entry__.entry``) call :func:`ensure_fused_kernels_usable` first
— it compiles each kernel once at tiny shapes and flips the corresponding
``EDTR_*_FUSED=0`` kill-switch on failure, so the run proceeds on the
reference paths at worst.
"""

from __future__ import annotations

import os

__all__ = ["ensure_fused_kernels_usable"]

_PROBED = False


def ensure_fused_kernels_usable() -> dict:
    """Probe-compile the fused kernels on the default backend (idempotent).

    Returns {kernel_name: bool usable}. No-op on CPU (dispatch already
    falls back there).
    """
    global _PROBED
    import jax
    import jax.numpy as jnp

    result = {"swin_block": True, "geglu": True, "ln_matmul": True}
    if jax.default_backend() != "tpu":
        return result
    if _PROBED:
        return {
            "swin_block": os.environ.get("EDTR_SWIN_FUSED", "1") != "0",
            "geglu": os.environ.get("EDTR_GEGLU_FUSED", "1") != "0",
            "ln_matmul": os.environ.get("EDTR_LNMM_FUSED", "1") != "0",
        }
    _PROBED = True

    from edtr_tpu.ops import geglu, swin_block

    h = w = 16
    win, c = 8, 128
    try:
        x = jnp.ones((1, h * w, c), jnp.bfloat16)
        one = jnp.ones((c,), jnp.float32)
        wq = jnp.ones((c, 3 * c), jnp.float32) * 0.01
        qkv_w, xr = jax.jit(
            lambda *a: swin_block.swin_pre(*a, h, w, win, 4)
        )(x, one, jnp.zeros((c,)), wq, jnp.zeros((3 * c,)))
        attn = qkv_w[..., :c]
        ws = [jnp.ones((c, c)) * 0.01, jnp.zeros((c,)), one, jnp.zeros((c,)),
              jnp.ones((c, 2 * c)) * 0.01, jnp.zeros((2 * c,)),
              jnp.ones((2 * c, c)) * 0.01, jnp.zeros((c,))]
        jax.block_until_ready(jax.jit(
            lambda *a: swin_block.swin_post(*a, h, w, win))(attn, xr, *ws))
    except Exception as e:  # pragma: no cover - device-specific
        os.environ["EDTR_SWIN_FUSED"] = "0"
        result["swin_block"] = False
        print(f"[kernel_probe] fused swin block disabled: {type(e).__name__}")

    try:
        xg = jnp.ones((1, geglu._SEQ_TILE, c), jnp.bfloat16)
        wg = jnp.ones((c, 4 * c), jnp.float32) * 0.01
        bg = jnp.zeros((4 * c,))
        sg = jnp.ones((c,), jnp.float32)
        jax.block_until_ready(
            jax.jit(geglu.geglu_proj)(xg, wg, wg, bg, bg))
        jax.block_until_ready(
            jax.jit(geglu.ln_geglu_proj)(xg, sg, 0 * sg, wg, wg, bg, bg))
    except Exception as e:  # pragma: no cover - device-specific
        os.environ["EDTR_GEGLU_FUSED"] = "0"
        result["geglu"] = False
        print(f"[kernel_probe] fused geglu disabled: {type(e).__name__}")

    from edtr_tpu.ops import ln_matmul

    result["ln_matmul"] = True
    try:
        xl = jnp.ones((1, ln_matmul._SEQ_TILE, c), jnp.bfloat16)
        sl = jnp.ones((c,), jnp.float32)
        wl = jnp.ones((c, c), jnp.float32) * 0.01
        jax.block_until_ready(jax.jit(
            lambda *a: ln_matmul.ln_matmuls(*a))(xl, sl, 0 * sl, wl, wl, wl))
    except Exception as e:  # pragma: no cover - device-specific
        os.environ["EDTR_LNMM_FUSED"] = "0"
        result["ln_matmul"] = False
        print(f"[kernel_probe] fused ln_matmul disabled: {type(e).__name__}")
    return result
