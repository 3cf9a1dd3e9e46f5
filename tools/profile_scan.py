#!/usr/bin/env python
"""Scan-stage profiler: where do the ~80 ms per denoise step (bs8) go?

The 4-step ControlNet+UNet scan is 51% of flagship e2e at 0.47 MFU
(r3 bench). This localizes the step cost:

* cldm step       — one ControlNet+UNet forward (the scan body)
* unet / controlnet — each alone (same conditioning shapes)
* GEGLU microbench at the three transformer levels (seq 4096/1024/256,
  C 320/640/1280): the FF projects to 2*4C, splits, gelu*mul — the
  2*4C intermediate is pure HBM traffic a fused-epilogue GEMM would skip
* LayerNorm microbench at the same token shapes (3 LNs per transformer
  block; SwinIR's LNs measured ~7x off roofline before fusion)
* ResBlock GN+SiLU+conv: see tools/bench_resblock.py

One JSON line. Run on the real chip. Env: EDTR_PROF_BATCH (8),
EDTR_PROF_ITERS (10).

Reference step graph: utils/sampler.py:184-204 -> model/cldm.py:166-194
-> model/controlnet.py:263-277 + :20-41.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_PROF_BATCH", "8"))
ITERS = int(os.environ.get("EDTR_PROF_ITERS", "10"))


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("EDTR_PROF_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    from edtr_tpu.utils.benchtime import timeit_chained

    results = {}
    on_cpu = jax.default_backend() == "cpu"

    # standalone UNet/ControlNet at flagship scale (the scan body's parts)
    from edtr_tpu.models.unet import UNetModel
    from edtr_tpu.models.controlnet import ControlNet

    lat = 8 if on_cpu else 64
    ctx_d = 1024 if not on_cpu else 64
    ucfg = dict(
        in_channels=4, out_channels=4, model_channels=320 if not on_cpu else 32,
        attention_resolutions=(4, 2, 1), num_res_blocks=2,
        channel_mult=(1, 2, 4, 4), num_head_channels=64 if not on_cpu else 16,
        transformer_depth=1, context_dim=ctx_d, use_linear_in_transformer=True,
        dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, lat, lat, 4), jnp.bfloat16)
    t = jnp.full((BATCH,), 200, jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 77, ctx_d), jnp.bfloat16)
    hint = jax.random.normal(jax.random.PRNGKey(2), (BATCH, lat, lat, 4), jnp.bfloat16)

    unet = UNetModel(**ucfg)
    uvars = jax.jit(unet.init)(jax.random.PRNGKey(3), x, t, ctx)
    uvars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, uvars)
    f_unet = jax.jit(lambda v, xx: unet.apply(v, xx, t, ctx))
    ms = timeit_chained(f_unet, uvars, x, iters=ITERS) * 1e3
    results["unet_fwd_ms_per_img"] = round(ms / BATCH, 3)

    ccfg = dict(ucfg)
    ccfg.pop("out_channels")
    cn = ControlNet(hint_channels=4, **ccfg)
    cvars = jax.jit(cn.init)(jax.random.PRNGKey(4), x, hint, t, ctx)
    cvars = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, cvars)
    f_cn = jax.jit(lambda v, xx: cn.apply(v, xx, hint, t, ctx)[-1])
    ms = timeit_chained(f_cn, cvars, x, iters=ITERS) * 1e3
    results["controlnet_fwd_ms_per_img"] = round(ms / BATCH, 3)

    # --- GEGLU + LN microbenches at the transformer level shapes ---
    REP = 16
    levels = [(4096, 320), (1024, 640), (256, 1280)]
    if on_cpu:
        levels = [(64, 32)]
    geglu, lns = {}, {}
    for seq, ch in levels:
        inner = 4 * ch
        xt = jax.random.normal(jax.random.PRNGKey(5), (BATCH, seq, ch), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(6), (ch, 2 * inner), jnp.bfloat16) * 0.02
        wo = jax.random.normal(jax.random.PRNGKey(7), (inner, ch), jnp.bfloat16) * 0.02

        def geglu_ff(v):
            def body(c, _):
                h = jnp.dot(c, w)
                a, g = jnp.split(h, 2, axis=-1)
                o = a * jax.nn.gelu(g, approximate=False)
                return jnp.dot(o, wo), None
            out, _ = jax.lax.scan(body, v, None, length=REP)
            return out

        f = jax.jit(geglu_ff)
        ms = timeit_chained(f, xt, iters=ITERS) / REP * 1e3
        flops = 2 * BATCH * seq * ch * 2 * inner + 2 * BATCH * seq * inner * ch
        peak = 197e12 if not on_cpu else 1e12
        geglu[f"{seq}x{ch}"] = {
            "ms": round(ms, 4),
            "mfu": round(flops / (ms * 1e-3) / peak, 3),
        }

        from edtr_tpu.models.layers import LayerNorm
        ln = LayerNorm()
        lp = jax.jit(ln.init)(jax.random.PRNGKey(8), xt)

        def rep_ln(p, v):
            def body(c, _):
                return ln.apply(p, c).astype(c.dtype), None
            out, _ = jax.lax.scan(body, v, None, length=REP)
            return out

        fl = jax.jit(rep_ln)
        ms = timeit_chained(fl, lp, xt, iters=ITERS) / REP * 1e3
        bw = 2 * BATCH * seq * ch * 2  # bf16 r+w
        lns[f"{seq}x{ch}"] = {
            "ms": round(ms, 4),
            "gbps": round(bw / (ms * 1e-3) / 1e9, 1),
        }

    results["geglu_ff"] = geglu
    results["layernorm"] = lns
    print(json.dumps({"metric": "scan internals profile", "batch": BATCH,
                      **results}))


if __name__ == "__main__":
    main()
