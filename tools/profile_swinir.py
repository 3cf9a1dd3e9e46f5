#!/usr/bin/env python
"""SwinIR stage profiler: where do the 10 ms/img go?

bench.py's per-stage split shows SwinIR at ~10.3 ms/img and only ~9% MFU
(BENCH_r03) — the weakest large stage. This tool localizes the cost by
variant subtraction on the flagship config (512^2 input, unshuffle x8,
dim 180, 8x6 blocks, window 8 — configs/det/voc2012/test/007_edtr-s4.yaml):

* full          — the real network (48 transformer blocks + conv tail)
* half-body     — depths (6,6,6,6): slope gives ms per transformer block
* conv-only     — depths (): shallow conv + x8 nearest+conv upsampler tail
* attention/LN/MLP microbenches at the exact body shapes
  (B*nW=512 windows, n=64 tokens, 6 heads, d_head=30)

Prints one JSON line. Run on the real chip; ~4 compiles of ~10-60 s.

Env: EDTR_PROF_BATCH (8), EDTR_PROF_ITERS (20).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_PROF_BATCH", "8"))
ITERS = int(os.environ.get("EDTR_PROF_ITERS", "20"))


def main():
    import jax

    if os.environ.get("EDTR_PROF_CPU") == "1":
        # the sitecustomize force-registers the axon TPU ahead of
        # JAX_PLATFORMS; this is the documented in-process escape hatch
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from edtr_tpu.models.swinir import SwinIR
    from edtr_tpu.ops.attention import dot_product_attention

    size = 512 if jax.default_backend() != "cpu" else 64

    from edtr_tpu.utils.benchtime import timeit_chained

    def timeit(fn, *args):
        return timeit_chained(fn, *args, iters=ITERS) * 1e3  # ms

    x = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, size, size, 3))
    results = {}

    def swinir_variant(name, depths):
        net = SwinIR(
            img_size=64, embed_dim=180, depths=depths,
            num_heads=(6,) * len(depths), window_size=8, mlp_ratio=2.0,
            sf=8, upsampler="nearest+conv", unshuffle=True,
            unshuffle_scale=8, dtype=jnp.bfloat16)
        params = jax.jit(net.init)(jax.random.PRNGKey(1), x[:1])
        # match the production path: bf16 weights (bench.py:156)
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            params)
        fn = jax.jit(lambda p, v: net.apply(p, v))
        results[name] = round(timeit(fn, params, x) / BATCH, 3)

    swinir_variant("full_ms_per_img", (6,) * 8)
    swinir_variant("half_body_ms_per_img", (6,) * 4)
    swinir_variant("conv_only_ms_per_img", ())

    per_block = (results["full_ms_per_img"] - results["half_body_ms_per_img"]) / 24
    results["per_block_ms_per_img"] = round(per_block, 4)
    results["body48_extrapolated_ms_per_img"] = round(per_block * 48, 3)

    # --- primitive microbenches at the exact body shapes (per image) ---
    # these kernels are sub-ms: repeat them inside ONE executable with a
    # lax.scan whose carry chains output->input (per-dispatch tunnel
    # latency would otherwise swamp the signal), then divide by the trip
    # count. Same pattern as tools/bench_attention.py.
    REP = 24
    lat = size // 8
    n_win = (lat // 8) ** 2
    bw, n, heads, d = BATCH * n_win, 64, 6, 30
    q = jax.random.normal(jax.random.PRNGKey(2), (bw, n, heads, d), jnp.bfloat16)
    bias = jax.random.normal(jax.random.PRNGKey(3), (1, heads, n, n), jnp.float32)

    def rep_attn(qq, kk, vv):
        def body(c, _):
            return dot_product_attention(c, kk, vv, bias=bias), None

        out, _ = jax.lax.scan(body, qq, None, length=REP)
        return out

    attn = jax.jit(rep_attn)
    results["window_attn_ms_per_img_x48"] = round(
        timeit(attn, q, q, q) / REP * 48 / BATCH, 3)

    from edtr_tpu.models.layers import LayerNorm

    ln = LayerNorm()
    tok = jax.random.normal(jax.random.PRNGKey(4), (BATCH, lat * lat, 180), jnp.bfloat16)
    lnp = jax.jit(ln.init)(jax.random.PRNGKey(5), tok)

    def rep_ln(p, v):
        def body(c, _):
            return ln.apply(p, c).astype(c.dtype), None

        out, _ = jax.lax.scan(body, v, None, length=REP)
        return out

    lfn = jax.jit(rep_ln)
    results["layernorm_ms_per_img_x96"] = round(
        timeit(lfn, lnp, tok) / REP * 96 / BATCH, 3)

    print(json.dumps({"metric": "swinir stage profile", "batch": BATCH,
                      "size": size, **results}))


if __name__ == "__main__":
    main()
