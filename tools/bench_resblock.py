#!/usr/bin/env python
"""Size the UNet ResBlock fusion prize before building a kernel.

The denoise scan is 51% of e2e at 0.47 MFU (r3 flagship bench); its convs
were measured ~54% MFU. This tool benches, at the exact UNet level shapes
(bs8 latent 64², channels 320/640/1280):

* the full ResBlock (GN+SiLU+conv3x3 + emb + GN+SiLU+conv3x3 + skip)
* its two conv3x3s alone
* a conv3x3 as 9 shifted matmuls (the Pallas kernel's compute plan, run
  through XLA to check the MXU shape is even favorable)

If (resblock - 2*conv) is small and shifted-matmul ≈ conv, a fused Pallas
ResBlock has little to win and the lever is dead — the honest outcome
either way goes in STATUS. One JSON line.

Reference hot path: ``model/unet.py:110-223`` ResBlock via
``main/det/train_edtr.py`` step graph.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_PROF_BATCH", "8"))
ITERS = int(os.environ.get("EDTR_PROF_ITERS", "20"))
REP = 8


def main():
    import jax

    if os.environ.get("EDTR_PROF_CPU") == "1" or \
            os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        # the axon sitecustomize force-registers the TPU ahead of
        # JAX_PLATFORMS; this is the documented in-process escape hatch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from edtr_tpu.models.unet import ResBlock
    from edtr_tpu.utils.benchtime import timeit_chained

    results = {}
    levels = [(64, 320), (32, 640), (16, 1280)]
    if jax.default_backend() == "cpu":
        levels = [(16, 64)]

    for size, ch in levels:
        x = jax.random.normal(jax.random.PRNGKey(0),
                              (BATCH, size, size, ch), jnp.bfloat16)
        emb = jax.random.normal(jax.random.PRNGKey(1),
                                (BATCH, 1280 if ch > 64 else 64), jnp.bfloat16)
        blk = ResBlock(out_channels=ch, dtype=jnp.bfloat16)
        params = jax.jit(blk.init)(jax.random.PRNGKey(2), x, emb)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)

        def rep(fn):
            def run(v, *rest):
                def body(c, _):
                    return fn(c, *rest).astype(v.dtype), None
                out, _ = jax.lax.scan(body, v, None, length=REP)
                return out
            return jax.jit(run)

        f_blk = rep(lambda v, p, e: blk.apply(p, v, e))
        t_blk = timeit_chained(f_blk, x, params, emb, iters=ITERS) / REP * 1e3

        w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, ch, ch),
                              jnp.bfloat16) * 0.02

        def conv_fn(v, wk):
            return jax.lax.conv_general_dilated(
                v, wk, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        f_conv = rep(conv_fn)
        t_conv = timeit_chained(f_conv, x, w, iters=ITERS) / REP * 1e3

        def conv_mm(v, wk):
            # 9 shifted matmuls: pad, then per-tap (B*H*W, C) @ (C, C)
            b, h, wdt, c = v.shape
            vp = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
            out = jnp.zeros((b, h, wdt, c), jnp.float32)
            for ky in range(3):
                for kx in range(3):
                    sl = vp[:, ky:ky + h, kx:kx + wdt, :].reshape(-1, c)
                    out = out + jnp.dot(
                        sl, wk[ky, kx],
                        preferred_element_type=jnp.float32).reshape(out.shape)
            return out.astype(v.dtype)

        f_mm = rep(conv_mm)
        t_mm = timeit_chained(f_mm, x, w, iters=ITERS) / REP * 1e3

        flops_conv = 2 * BATCH * size * size * 9 * ch * ch
        peak = 197e12 if jax.default_backend() != "cpu" else 1e12
        results[f"{size}x{size}x{ch}"] = {
            "resblock_ms": round(t_blk, 4),
            "conv3x3_ms": round(t_conv, 4),
            "conv_as_matmuls_ms": round(t_mm, 4),
            "conv_mfu": round(flops_conv / (t_conv * 1e-3) / peak, 3),
            "overhead_ms": round(t_blk - 2 * t_conv, 4),
        }

    print(json.dumps({"metric": "unet resblock split", "batch": BATCH,
                      **results}))


if __name__ == "__main__":
    main()
