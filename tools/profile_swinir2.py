#!/usr/bin/env python
"""SwinIR stage deep profile (round 5, VERDICT #2): price the levers.

BENCH_r04: swinir stage 10.95 ms/img at MFU 0.084, 15% of serial time.
This REP-amortized microprofile (see tools/roofline_scan.py's DCE/LICM
discipline) prices each candidate fix at the exact flagship shapes
(512² -> 64×64 tokens, C=180, 6 heads, d=30, window 8, 48 blocks, bs8):

* whole net + depth-subtraction per-block cost (per-dispatch, multi-ms)
* LayerNorm at (B·4096, 180) vs lane-padded 192
* body GEMMs: qkv/proj/MLP at C=180 vs 192 (the 180 -> 256-lane padding
  waste vs exact 1.5x128 lanes)
* window-attention core, three formulations:
    - micro: batched per-window einsum (B·64 wins, 64 tok, 6 heads, d=30)
      — the shipped ops/window_attention.py core
    - micro-d32: same with d zero-padded to 32
    - slab: window-row slabs (B·8, 512 tok) dense attention with a
      block-diagonal mask — 8x the flops, MXU-shaped
* window partition/reverse reshape-transpose round-trip alone

One JSON line. Env: EDTR_PROF_ITERS (10), EDTR_PROF_REP (16).
Ref: /root/reference/model/swinir.py:69-264.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("EDTR_PROF_ITERS", "10"))
REP = int(os.environ.get("EDTR_PROF_REP", "16"))
PEAK = 197e12
BATCH = 8


def _time_rep(fn, x, gflops):
    import jax
    import jax.numpy as jnp

    from edtr_tpu.utils.benchtime import timeit_chained

    def body(carry, _):
        c, acc = carry
        out = fn(c)
        s = sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                for leaf in jax.tree.leaves(out))
        acc = acc + s
        c2 = c + (acc * 1e-20).astype(c.dtype)
        return (c2, acc), None

    def run(x):
        (_, acc), _ = jax.lax.scan(
            body, (x, jnp.zeros((), jnp.float32)), None, length=REP)
        return acc

    ms = timeit_chained(jax.jit(run), x, iters=ITERS) / REP * 1e3
    return {"ms": round(ms, 4), "gflops": round(gflops, 2),
            "mfu": round(gflops * 1e9 / (ms * 1e-3) / PEAK, 3)}


def main():
    import jax
    import jax.numpy as jnp

    from edtr_tpu.utils.benchtime import timeit_chained

    key = jax.random.PRNGKey(0)
    out = {"batch": BATCH, "iters": ITERS, "rep": REP}
    N = 64 * 64  # tokens per image
    M = BATCH * N

    # ---- whole net + per-block slope ---------------------------------------
    from edtr_tpu.models.swinir import SwinIR

    x_img = jax.random.uniform(key, (BATCH, 512, 512, 3))
    whole = {}
    for name, depths, pad in [("d48", (6,) * 8, 0), ("d24", (6,) * 4, 0),
                              ("d48_pad192", (6,) * 8, 12)]:
        net = SwinIR(img_size=64, embed_dim=180, depths=depths,
                     num_heads=(6,) * len(depths), window_size=8,
                     mlp_ratio=2.0, sf=8, upsampler="nearest+conv",
                     unshuffle=True, unshuffle_scale=8, dtype=jnp.bfloat16,
                     lane_pad=pad)
        params = jax.jit(net.init)(jax.random.PRNGKey(1), x_img[:1])
        params = jax.tree.map(
            lambda a: a.astype(jnp.bfloat16)
            if a.dtype == jnp.float32 else a, params)
        f = jax.jit(lambda p, v: net.apply(p, v))
        ms = timeit_chained(f, params, x_img, iters=ITERS) * 1e3
        whole[name] = round(ms, 2)
    whole["ms_per_block_batch"] = round((whole["d48"] - whole["d24"]) / 24, 4)
    whole["tail_conv_ms"] = round(whole["d24"] - 24 * (
        (whole["d48"] - whole["d24"]) / 24), 2)
    out["whole"] = whole
    print(json.dumps({"section": "whole", **whole}), file=sys.stderr, flush=True)

    # ---- LayerNorm 180 vs 192 ----------------------------------------------
    lns = {}
    for c in (180, 192):
        xt = jax.random.normal(key, (M, c), jnp.bfloat16)
        w = jnp.ones((c,), jnp.float32)
        b = jnp.zeros((c,), jnp.float32)

        def ln(v):
            m = v.astype(jnp.float32)
            mu = m.mean(-1, keepdims=True)
            var = ((m - mu) ** 2).mean(-1, keepdims=True)
            return ((m - mu) * jax.lax.rsqrt(var + 1e-5) * w + b).astype(v.dtype)

        lns[f"{c}"] = _time_rep(ln, xt, 0.0)
        lns[f"{c}"]["gbps"] = round(
            2 * M * c * 2 / (lns[f"{c}"]["ms"] * 1e-3) / 1e9, 1)
    out["layernorm"] = lns
    print(json.dumps({"section": "layernorm", **lns}), file=sys.stderr, flush=True)

    # ---- body GEMMs at 180 vs 192 -------------------------------------------
    gemm = {}
    for cin, cout, tag in [(180, 540, "qkv"), (180, 180, "proj"),
                           (180, 360, "fc1"), (360, 180, "fc2"),
                           (192, 576, "qkv_pad"), (192, 192, "proj_pad"),
                           (192, 384, "fc1_pad"), (384, 192, "fc2_pad")]:
        a = jax.random.normal(key, (M, cin), jnp.bfloat16)
        w = jax.random.normal(key, (cin, cout), jnp.bfloat16) * 0.02
        gemm[tag] = _time_rep(lambda c, w=w: c @ w, a, 2 * M * cin * cout / 1e9)
    out["gemm"] = gemm
    print(json.dumps({"section": "gemm", **gemm}), file=sys.stderr, flush=True)

    # ---- attention core formulations ----------------------------------------
    from edtr_tpu.ops.attention import _xla_attention

    attn = {}
    nw, W, H = 64, 64, 6
    for d, tag in [(30, "micro_d30"), (32, "micro_d32")]:
        q = jax.random.normal(key, (BATCH * nw, W, H, d), jnp.bfloat16)
        fl = 4 * BATCH * nw * H * W * W * d / 1e9
        attn[tag] = _time_rep(
            lambda c: _xla_attention(c, c, c, c.shape[-1] ** -0.5), q, fl)

    # slab: 8 window-rows of 512 tokens, block-diag window mask
    S = 512
    mask = jnp.where(
        (jnp.arange(S)[:, None] // W) == (jnp.arange(S)[None, :] // W),
        0.0, -1e9).astype(jnp.float32)[None, None]
    for d, tag in [(32, "slab_d32")]:
        q = jax.random.normal(key, (BATCH * 8, S, H, d), jnp.bfloat16)
        fl = 4 * BATCH * 8 * H * S * S * d / 1e9
        attn[tag] = _time_rep(
            lambda c: _xla_attention(c, c, c, c.shape[-1] ** -0.5, bias=mask),
            q, fl)
    out["attn_core"] = attn
    print(json.dumps({"section": "attn_core", **attn}), file=sys.stderr, flush=True)

    # ---- partition/reverse transposes alone ---------------------------------
    from edtr_tpu.models.swinir import window_partition, window_reverse

    xt = jax.random.normal(key, (BATCH, 64, 64, 180), jnp.bfloat16)

    def part_rev(v):
        wins = window_partition(v, 8)          # (B*nW, 64, C)
        return window_reverse(wins, 8, 64, 64)

    out["partition_reverse"] = _time_rep(part_rev, xt, 0.0)
    out["partition_reverse"]["gbps"] = round(
        2 * BATCH * N * 180 * 2 * 2 / (out["partition_reverse"]["ms"] * 1e-3)
        / 1e9, 1)

    print(json.dumps({"metric": "swinir deep profile", **out}))


if __name__ == "__main__":
    main()
