"""Fail-safe probe for the optional fused Pallas kernels.

The fused swin-block / GEGLU / LN+GEMM kernels are default-on on TPU with
pure-XLA reference fallbacks selected at dispatch time. A Mosaic lowering
regression (new jaxlib, new TPU generation) or a VMEM budget miss would
otherwise surface as a compile failure in the middle of a big model build;
entry points that must never hard-fail (bench.py, ``__graft_entry__.entry``)
call :func:`ensure_fused_kernels_usable` first — it compiles each kernel
once at the flagship worst-case per-grid-cell shapes (batch 1: the cell
footprint is batch-independent) and flips the corresponding
``EDTR_*_FUSED=0`` kill-switch on failure, so the run proceeds on the
reference paths at worst. Diagnostics go to stderr (bench.py's stdout is
one JSON line by contract).
"""

from __future__ import annotations

import os
import sys

__all__ = ["ensure_fused_kernels_usable"]

_PROBED = False

_SWITCHES = {
    "swin_block": "EDTR_SWIN_FUSED",
    "geglu": "EDTR_GEGLU_FUSED",
    "ln_matmul": "EDTR_LNMM_FUSED",
    "gn_conv": "EDTR_GNCONV_FUSED",
    "ups_conv": "EDTR_UPSCONV_FUSED",
}


def _enabled(name: str) -> bool:
    return os.environ.get(_SWITCHES[name], "1") != "0"


def ensure_fused_kernels_usable() -> dict:
    """Probe-compile the fused kernels on the default backend (idempotent).

    Returns {kernel_name: bool usable-and-enabled}. No-op on CPU (dispatch
    already falls back there) and for kernels whose kill-switch is pre-set.
    """
    global _PROBED
    import jax
    import jax.numpy as jnp

    from edtr_tpu.ops import geglu, gn_conv, ln_matmul, swin_block

    def status():
        s = {k: _enabled(k) for k in _SWITCHES}
        s["gn_conv_band"] = s["gn_conv"] and gn_conv._band_enabled()
        return s

    if jax.default_backend() != "tpu" or _PROBED:
        return status()
    _PROBED = True

    def _disable(name, exc):
        os.environ[_SWITCHES[name]] = "0"
        print(f"[kernel_probe] fused {name} disabled: {type(exc).__name__}: "
              f"{exc}", file=sys.stderr)

    # flagship worst-case per-cell shapes: SwinIR 64x64 tokens C=180;
    # geglu / ln_matmul at the C=1280 transformer level
    if _enabled("swin_block"):
        try:
            h = w = 64
            win, c, hid = 8, 180, 360
            x = jnp.ones((1, h * w, c), jnp.bfloat16)
            one = jnp.ones((c,), jnp.float32)
            wq = jnp.ones((c, 3 * c), jnp.float32) * 0.01
            qkv_w, xr = jax.jit(
                lambda *a: swin_block.swin_pre(*a, h, w, win, 4)
            )(x, one, jnp.zeros((c,)), wq, jnp.zeros((3 * c,)))
            attn = qkv_w[..., :c]
            ws = [jnp.ones((c, c)) * 0.01, jnp.zeros((c,)),
                  one, jnp.zeros((c,)),
                  jnp.ones((c, hid)) * 0.01, jnp.zeros((hid,)),
                  jnp.ones((hid, c)) * 0.01, jnp.zeros((c,))]
            jax.block_until_ready(jax.jit(
                lambda *a: swin_block.swin_post(*a, h, w, win))(attn, xr, *ws))
        except Exception as e:  # pragma: no cover - device-specific
            _disable("swin_block", e)

    if _enabled("geglu"):
        try:
            c, inner = 1280, 5120
            xg = jnp.ones((1, geglu._SEQ_TILE, c), jnp.bfloat16)
            wg = jnp.ones((c, inner), jnp.float32) * 0.01
            bg = jnp.zeros((inner,))
            sg = jnp.ones((c,), jnp.float32)
            jax.block_until_ready(
                jax.jit(geglu.geglu_proj)(xg, wg, wg, bg, bg))
            jax.block_until_ready(
                jax.jit(geglu.ln_geglu_proj)(xg, sg, 0 * sg, wg, wg, bg, bg))
        except Exception as e:  # pragma: no cover - device-specific
            _disable("geglu", e)

    if _enabled("ln_matmul"):
        try:
            c = 1280
            xl = jnp.ones((1, ln_matmul._SEQ_TILE, c), jnp.bfloat16)
            sl = jnp.ones((c,), jnp.float32)
            wl = jnp.ones((c, c), jnp.float32) * 0.01
            jax.block_until_ready(jax.jit(
                lambda *a: ln_matmul.ln_matmuls(*a))(
                    xl, sl, 0 * sl, wl, wl, wl))
            jax.block_until_ready(jax.jit(
                lambda *a: ln_matmul.affine_matmul(*a))(
                    xl, sl.reshape(1, c), 0 * sl.reshape(1, c), wl,
                    jnp.zeros((c,), jnp.float32)))
        except Exception as e:  # pragma: no cover - device-specific
            _disable("ln_matmul", e)

    if _enabled("gn_conv"):
        def _probe_gnconv(shapes):
            for h, cin, cout in shapes:
                xg = jnp.ones((1, h, h, cin), jnp.bfloat16)
                mu = jnp.ones((1, cin), jnp.float32)
                wk = jnp.ones((3, 3, cin, cout), jnp.float32) * 0.01
                bk = jnp.zeros((cout,), jnp.float32)
                eg = jnp.ones((1, cout), jnp.bfloat16)
                rg = jnp.zeros((1, h, h, cout), jnp.bfloat16)
                jax.block_until_ready(jax.jit(gn_conv.gn_silu_conv)(
                    xg, mu, 0 * mu, wk, bk, eg, rg))

        # whole-image tier (h<16 dispatch; batch 1 — the per-cell footprint
        # is batch-independent)
        try:
            _probe_gnconv([(8, 1280, 1280)])
        except Exception as e:  # pragma: no cover - device-specific
            _disable("gn_conv", e)
        # band-tier worst cases get their own kill-switch — a VMEM miss on
        # a marginal band plan degrades those shapes to the whole-image
        # tier or the XLA reference, not the whole kernel
        if _enabled("gn_conv") and gn_conv._band_enabled():
            try:
                _probe_gnconv([(64, 320, 320), (32, 640, 640),
                               (64, 960, 320), (512, 256, 128)])
            except Exception as e:  # pragma: no cover - device-specific
                os.environ["EDTR_GNCONV_BAND"] = "0"
                print(f"[kernel_probe] gn_conv band tier disabled: "
                      f"{type(e).__name__}: {e}", file=sys.stderr)

    if _enabled("ups_conv"):
        try:
            # VAE up_1 (256²->512², the tightest r=4 plan) + UNet 32²->64²
            for hl, cin, cout in [(256, 256, 256), (32, 640, 640)]:
                xu = jnp.ones((1, hl, hl, cin), jnp.bfloat16)
                wu = jnp.ones((3, 3, cin, cout), jnp.float32) * 0.01
                bu = jnp.zeros((cout,), jnp.float32)
                jax.block_until_ready(jax.jit(
                    lambda *a: gn_conv.upsample_conv(*a, "lrelu"))(
                        xu, wu, bu))
        except Exception as e:  # pragma: no cover - device-specific
            _disable("ups_conv", e)
    return status()
