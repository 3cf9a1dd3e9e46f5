#!/usr/bin/env python
"""Roofline decomposition of the flagship scan stage (VERDICT r4 next #1).

The 4-step ControlNet+UNet scan is 37.8 ms/img at MFU 0.474 (BENCH_r04) —
51% of serial time. Both scheduling knobs measured negative in r4, so
before building any new fused kernel this measures, on the real chip:

1. ``gemm``     — the PRACTICAL MXU ceiling through this tunnel: big square
                  bf16 GEMMs plus the exact UNet FF/projection shapes. Any
                  per-op "MFU" below is judged against this, not the paper
                  197 TF/s.
2. ``conv``     — 3x3 conv ceiling at the UNet resblock shapes.
3. ``attn_core``— softmax(QK^T)V alone per transformer level, flash vs XLA
                  (the d_head-64 contraction cap made visible).
4. ``block``    — one full BasicTransformerBlock per level as shipped
                  (LN+self-attn+cross-attn+GEGLU FF, residuals).
5. ``resblock`` — one full ResBlock per level as shipped.
6. ``synth``    — bottom-up floor: sum over the step's 23 transformer
                  blocks + 30 resblocks of measured-part time, vs the
                  measured whole-step time. The gap is what whole-block
                  fusion could recover; if parts ~= whole, the stage is at
                  its structural floor and the scan verdict is "roofline".

Per entry: ms (chained timing, edtr_tpu/utils/benchtime.py), flops from the
compiled executable's cost analysis, mfu vs 197 TF/s (v5e bf16 peak).

One JSON line -> stdout (tee to results/chip_queue/roofline_scan.json).
Env: EDTR_ROOF_ITERS (20), EDTR_ROOF_SECTIONS (comma list, default all).

Reference step graph: utils/sampler.py:184-204 -> model/cldm.py:166-194 ->
model/controlnet.py:263-277 + model/unet.py:361-719 (/root/reference).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("EDTR_ROOF_ITERS", "20"))
SECTIONS = os.environ.get(
    "EDTR_ROOF_SECTIONS", "gemm,conv,attn_core,block,resblock,synth"
).split(",")
PEAK = 197e12  # v5e bf16


def _flops(fn, *args):
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def _time(fn, *args):
    from edtr_tpu.utils.benchtime import timeit_chained

    f = jax.jit(fn)
    ms = timeit_chained(f, *args, iters=ITERS) * 1e3
    fl, by = _flops(fn, *args)
    return {
        "ms": round(ms, 4),
        "gflops": round(fl / 1e9, 2),
        "mfu": round(fl / (ms * 1e-3) / PEAK, 3),
        "gbps": round(by / (ms * 1e-3) / 1e9, 1),
    }


BATCH = 8
# (seq, C, heads): the UNet/ControlNet transformer levels at 512^2 flagship
LEVELS = [(4096, 320, 5), (1024, 640, 10), (256, 1280, 20), (64, 1280, 20)]
# (H, W, Cin, Cout): representative resblock shapes (enc same-ch, dec concat)
RES_SHAPES = [
    (64, 64, 320, 320), (64, 64, 640, 320),
    (32, 32, 640, 640), (32, 32, 1280, 640),
    (16, 16, 1280, 1280), (16, 16, 2560, 1280),
    (8, 8, 1280, 1280), (8, 8, 2560, 1280),
]


def main():
    global jax
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    out = {"batch": BATCH, "iters": ITERS}

    if "gemm" in SECTIONS:
        gemm = {}
        shapes = [
            (8192, 8192, 8192),            # square ceiling
            (4096, 4096, 4096),
            # UNet FF proj / out at the three levels (M = batch*seq)
            (8 * 4096, 320, 2560), (8 * 4096, 1280, 320),
            (8 * 1024, 640, 5120), (8 * 1024, 2560, 640),
            (8 * 256, 1280, 10240), (8 * 256, 5120, 1280),
            # qkv packed projections
            (8 * 4096, 320, 960), (8 * 1024, 640, 1920), (8 * 256, 1280, 3840),
            # lane-alignment probe: K=320 vs K=384 at same M/N
            (8 * 4096, 384, 2560),
        ]
        for m, k_, n in shapes:
            a = jax.random.normal(key, (m, k_), jnp.bfloat16)
            b = jax.random.normal(key, (k_, n), jnp.bfloat16)
            gemm[f"{m}x{k_}x{n}"] = _time(lambda a, b: a @ b, a, b)
        out["gemm"] = gemm

    if "conv" in SECTIONS:
        conv = {}
        for h, w, ci, co in [(64, 64, 320, 320), (32, 32, 640, 640),
                             (16, 16, 1280, 1280), (8, 8, 1280, 1280)]:
            x = jax.random.normal(key, (BATCH, h, w, ci), jnp.bfloat16)
            wt = jax.random.normal(key, (3, 3, ci, co), jnp.bfloat16) * 0.02

            def f(x, wt):
                return jax.lax.conv_general_dilated(
                    x, wt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))

            conv[f"{h}x{w}x{ci}->{co}"] = _time(f, x, wt)
        out["conv"] = conv

    if "attn_core" in SECTIONS:
        from edtr_tpu.ops import attention as attn_mod

        cores = {}
        for seq, c, heads in LEVELS:
            d = c // heads
            q = jax.random.normal(key, (BATCH, seq, heads, d), jnp.bfloat16)
            for backend in ("flash", "xla"):
                attn_mod.set_attention_backend(backend)

                def f(q):
                    return attn_mod.dot_product_attention(q, q, q)

                cores[f"{seq}x{heads}x{d}:{backend}"] = _time(f, q)
        attn_mod.set_attention_backend("auto")
        out["attn_core"] = cores

    if "block" in SECTIONS:
        from edtr_tpu.models.attention import BasicTransformerBlock

        blocks = {}
        ctx = jax.random.normal(key, (BATCH, 77, 1024), jnp.bfloat16)
        for seq, c, heads in LEVELS:
            blk = BasicTransformerBlock(
                dim=c, n_heads=heads, d_head=c // heads, context_dim=1024,
                dtype=jnp.bfloat16)
            x = jax.random.normal(key, (BATCH, seq, c), jnp.bfloat16)
            v = jax.jit(blk.init)(key, x, ctx)
            v = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v)

            def f(v, x, ctx):
                return blk.apply(v, x, ctx)

            blocks[f"{seq}x{c}"] = _time(f, v, x, ctx)
        out["block"] = blocks

    if "resblock" in SECTIONS:
        from edtr_tpu.models.unet import ResBlock

        res = {}
        emb = jax.random.normal(key, (BATCH, 1280), jnp.bfloat16)
        for h, w, ci, co in RES_SHAPES:
            rb = ResBlock(out_channels=co, dtype=jnp.bfloat16)
            x = jax.random.normal(key, (BATCH, h, w, ci), jnp.bfloat16)
            v = jax.jit(rb.init)(key, x, emb)
            v = jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if a.dtype == jnp.float32 else a, v)

            def f(v, x, emb):
                return rb.apply(v, x, emb)

            res[f"{h}x{w}x{ci}->{co}"] = _time(f, v, x, emb)
        out["resblock"] = res

    if "synth" in SECTIONS and "block" in out and "resblock" in out:
        # Step composition at 512^2 (UNet dec levels have 3 blocks each):
        #   transformer blocks: 7x L1 + 7x L2 + 7x L3 + 2x L4 (5 UNet + 2 CN
        #   at each of ds1/2/4; middle UNet+CN at ds8)
        #   resblocks (UNet 22 + CN 9, by shape family):
        b = out["block"]
        r = out["resblock"]
        t_attn = (7 * b["4096x320"]["ms"] + 7 * b["1024x640"]["ms"]
                  + 7 * b["256x1280"]["ms"] + 2 * b["64x1280"]["ms"])
        # resblock census per step (UNet enc 8 + mid 2 + dec 12; CN enc 8 +
        # mid 1), mapped to the measured same/concat shapes per level:
        census = {
            "64x64x320->320": 2 + 2,       # unet enc l0 + cn enc l0
            "64x64x640->320": 3,           # unet dec l0 (concat 640/512...)
            "32x32x640->640": 2 + 2,       # enc l1 (320->640 approx by 640)
            "32x32x1280->640": 3,          # dec l1 concat
            "16x16x1280->1280": 2 + 2 + 3 + 3,  # enc l2 + l3(8x8-ish) ...
            "16x16x2560->1280": 3 + 3,     # dec l2 + l3 concat
            "8x8x1280->1280": 2 + 1,       # middles
        }
        t_res = sum(r[k]["ms"] * n for k, n in census.items() if k in r)
        fl_attn = (7 * b["4096x320"]["gflops"] + 7 * b["1024x640"]["gflops"]
                   + 7 * b["256x1280"]["gflops"] + 2 * b["64x1280"]["gflops"])
        fl_res = sum(r[k]["gflops"] * n for k, n in census.items() if k in r)
        out["synth"] = {
            "sum_parts_ms_per_step": round(t_attn + t_res, 2),
            "sum_parts_ms_per_img_4steps": round(
                (t_attn + t_res) * 4 / BATCH, 2),
            "attn_blocks_ms": round(t_attn, 2),
            "resblocks_ms": round(t_res, 2),
            "parts_gflops_per_step_per_batch": round(fl_attn + fl_res, 1),
            "note": ("census approximates transition/concat channel counts "
                     "by the nearest measured shape; compare vs the measured "
                     "scan stage 37.8 ms/img (BENCH_r04)"),
        }

    print(json.dumps({"metric": "scan roofline", **out}))


if __name__ == "__main__":
    main()
