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
                  blocks + 31 resblocks of measured-part time, vs the
                  measured whole-step time. The gap is what whole-block
                  fusion could recover; if parts ~= whole, the stage is at
                  its structural floor and the scan verdict is "roofline".

MEASUREMENT NOTE (learned the hard way in the first run of this tool): a
single chained dispatch through the axon tunnel carries ~2 ms of overhead,
so sub-ms executables read 3-30x slow if timed per-dispatch. Every op here
runs REP times inside one ``lax.scan`` whose carry chains a negligible
data dependency (``x + out[0]*1e-12`` — not constant-foldable), so one
dispatch amortizes over REP real executions; ms figures are per execution.
Whole-model rows (unet/cldm step) are multi-ms and timed per-dispatch.

Per entry: ms, analytic gflops (cost_analysis misses Pallas flops), mfu vs
197 TF/s (v5e bf16 peak).

One JSON line -> stdout (tee to results/chip_queue/roofline_scan.json).
Env: EDTR_ROOF_ITERS (10), EDTR_ROOF_REP (16), EDTR_ROOF_SECTIONS.

Reference step graph: utils/sampler.py:184-204 -> model/cldm.py:166-194 ->
model/controlnet.py:263-277 + model/unet.py:361-719 (/root/reference).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("EDTR_ROOF_ITERS", "10"))
REP = int(os.environ.get("EDTR_ROOF_REP", "16"))
SECTIONS = os.environ.get(
    "EDTR_ROOF_SECTIONS", "gemm,conv,attn_core,block,resblock,whole,synth"
).split(",")
PEAK = 197e12  # v5e bf16


def _time_rep(fn, x, gflops, *, rep=None):
    """ms per execution of ``fn(x)`` amortized over ``rep`` chained runs.

    DCE/LICM discipline (the first draft of this tool measured 8.5 "MFU" on
    an 8192^3 GEMM because only element [0] of each output was consumed and
    XLA reduced the matmul to a dot product): every output element feeds a
    f32 sum(abs(.)) — nonlinear, so it cannot be algebraically pushed
    through the op, and it fuses into the op's epilogue (no extra HBM
    round-trip) — and the running scalar perturbs the next iteration's
    input by ~1e-20 relative so the op is not loop-invariant.
    """
    import jax
    import jax.numpy as jnp

    from edtr_tpu.utils.benchtime import timeit_chained

    rep = rep or REP

    def body(carry, _):
        c, acc = carry
        out = fn(c)
        s = sum(jnp.sum(jnp.abs(leaf.astype(jnp.float32)))
                for leaf in jax.tree.leaves(out))
        acc = acc + s
        c2 = c + (acc * 1e-20).astype(c.dtype)
        return (c2, acc), None

    def run(x):
        (y, acc), _ = jax.lax.scan(
            body, (x, jnp.zeros((), jnp.float32)), None, length=rep)
        return acc

    ms = timeit_chained(jax.jit(run), x, iters=ITERS) / rep * 1e3
    return {
        "ms": round(ms, 4),
        "gflops": round(gflops, 2),
        "mfu": round(gflops * 1e9 / (ms * 1e-3) / PEAK, 3),
    }


BATCH = 8
# (seq, C, heads): the UNet/ControlNet transformer levels at 512^2 flagship
LEVELS = [(4096, 320, 5), (1024, 640, 10), (256, 1280, 20), (64, 1280, 20)]
RES_SHAPES = [
    (64, 64, 320, 320), (64, 64, 640, 320),
    (32, 32, 640, 640), (32, 32, 1280, 640),
    (16, 16, 1280, 1280), (16, 16, 2560, 1280),
    (8, 8, 1280, 1280), (8, 8, 2560, 1280),
]


def main():
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    out = {"batch": BATCH, "iters": ITERS, "rep": REP}

    if "gemm" in SECTIONS:
        gemm = {}
        shapes = [
            (8192, 8192, 8192), (4096, 4096, 4096),
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
            b = jax.random.normal(key, (k_, n), jnp.bfloat16) * 0.02
            a = jax.random.normal(key, (m, k_), jnp.bfloat16)
            gemm[f"{m}x{k_}x{n}"] = _time_rep(
                lambda c, b=b: c @ b, a, 2 * m * k_ * n / 1e9)
        out["gemm"] = gemm

    if "conv" in SECTIONS:
        conv = {}
        for h, w, ci, co in [(64, 64, 320, 320), (32, 32, 640, 640),
                             (16, 16, 1280, 1280), (8, 8, 1280, 1280)]:
            x = jax.random.normal(key, (BATCH, h, w, ci), jnp.bfloat16)
            wt = jax.random.normal(key, (3, 3, ci, co), jnp.bfloat16) * 0.02
            conv[f"{h}x{w}x{ci}->{co}"] = _time_rep(
                lambda c, wt=wt: jax.lax.conv_general_dilated(
                    c, wt, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC")),
                x, 2 * 9 * BATCH * h * w * ci * co / 1e9)
        out["conv"] = conv

    if "attn_core" in SECTIONS:
        from edtr_tpu.ops import attention as attn_mod

        cores = {}
        for seq, c, heads in LEVELS:
            d = c // heads
            q = jax.random.normal(key, (BATCH, seq, heads, d), jnp.bfloat16)
            fl = 4 * BATCH * heads * seq * seq * d / 1e9
            variants = [("flash", "wholekv"), ("xla", None)]
            if seq >= 2048:
                variants.insert(1, ("flash_online", "online"))
            for backend, bigseq in variants:
                attn_mod.set_attention_backend(backend.split("_")[0])
                if bigseq is not None:
                    os.environ["EDTR_FLASH_BIGSEQ"] = bigseq
                cores[f"{seq}x{heads}x{d}:{backend}"] = _time_rep(
                    lambda c: attn_mod.dot_product_attention(c, c, c), q, fl)
            os.environ.pop("EDTR_FLASH_BIGSEQ", None)
        attn_mod.set_attention_backend("auto")
        out["attn_core"] = cores
        print(json.dumps({"section": "attn_core", **cores}), file=sys.stderr, flush=True)

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
            # analytic: attn1 qkv+out 4NC^2 + core 4N^2C; attn2 q+out 2NC^2
            # + kv 2*77*1024*C + core 4N*77*C; FF 24NC^2  (MACs*2)
            fl = BATCH * (4 * seq * c * c + 4 * seq * seq * c
                          + 2 * seq * c * c + 4 * 77 * 1024 * c
                          + 4 * seq * 77 * c + 24 * seq * c * c) / 1e9
            blocks[f"{seq}x{c}"] = _time_rep(
                lambda xx, blk=blk, v=v, ctx=ctx: blk.apply(v, xx, ctx), x, fl)
        out["block"] = blocks
        print(json.dumps({"section": "block", **blocks}), file=sys.stderr, flush=True)

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
            fl = BATCH * h * w * (18 * ci * co + 18 * co * co
                                  + (2 * ci * co if ci != co else 0)) / 1e9
            res[f"{h}x{w}x{ci}->{co}"] = _time_rep(
                lambda xx, rb=rb, v=v: rb.apply(v, xx, emb), x, fl)
        out["resblock"] = res
        print(json.dumps({"section": "resblock", **res}), file=sys.stderr, flush=True)

    if "whole" in SECTIONS:
        # whole UNet / ControlNet forwards, per-dispatch (multi-ms: tunnel
        # overhead is a few % here) — the ground truth the synth compares to
        from edtr_tpu.models.controlnet import ControlNet
        from edtr_tpu.models.unet import UNetModel
        from edtr_tpu.utils.benchtime import timeit_chained

        ucfg = dict(
            in_channels=4, out_channels=4, model_channels=320,
            attention_resolutions=(4, 2, 1), num_res_blocks=2,
            channel_mult=(1, 2, 4, 4), num_head_channels=64,
            transformer_depth=1, context_dim=1024,
            use_linear_in_transformer=True, dtype=jnp.bfloat16)
        x = jax.random.normal(key, (BATCH, 64, 64, 4), jnp.bfloat16)
        t = jnp.full((BATCH,), 200, jnp.int32)
        ctx = jax.random.normal(key, (BATCH, 77, 1024), jnp.bfloat16)
        hint = jax.random.normal(key, (BATCH, 64, 64, 4), jnp.bfloat16)
        unet = UNetModel(**ucfg)
        uv = jax.jit(unet.init)(key, x, t, ctx)
        uv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, uv)
        ms_u = timeit_chained(jax.jit(lambda v, xx: unet.apply(v, xx, t, ctx)),
                              uv, x, iters=ITERS) * 1e3
        ccfg = {k: v for k, v in ucfg.items() if k != "out_channels"}
        cn = ControlNet(hint_channels=4, **ccfg)
        cv = jax.jit(cn.init)(key, x, hint, t, ctx)
        cv = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                          if a.dtype == jnp.float32 else a, cv)
        ms_c = timeit_chained(
            jax.jit(lambda v, xx: cn.apply(v, xx, hint, t, ctx)[-1]),
            cv, x, iters=ITERS) * 1e3
        out["whole"] = {"unet_ms": round(ms_u, 2),
                        "controlnet_ms": round(ms_c, 2),
                        "step_ms": round(ms_u + ms_c, 2),
                        "step_ms_per_img_4steps": round(
                            (ms_u + ms_c) * 4 / BATCH, 2)}

    if "synth" in SECTIONS and "block" in out and "resblock" in out:
        b, r = out["block"], out["resblock"]
        t_attn = (7 * b["4096x320"]["ms"] + 7 * b["1024x640"]["ms"]
                  + 7 * b["256x1280"]["ms"] + 2 * b["64x1280"]["ms"])
        census = {
            "64x64x320->320": 2 + 2,       # unet enc l0 + cn enc l0
            "64x64x640->320": 3,           # unet dec l0 (concat)
            "32x32x640->640": 2 + 2,
            "32x32x1280->640": 3,
            "16x16x1280->1280": 2 + 2 + 3 + 3,
            "16x16x2560->1280": 3 + 3,
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
                     "scan stage 37.8 ms/img (BENCH_r04) and the 'whole' "
                     "section's per-dispatch UNet+CN step"),
        }

    print(json.dumps({"metric": "scan roofline", **out}))


if __name__ == "__main__":
    main()
