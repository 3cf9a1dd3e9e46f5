#!/usr/bin/env python
"""Scan-stage A/B: attention backend x sampler unroll, on the real chip.

    python tools/ab_scan.py [--out results/chip_queue/ab_scan.json]
                            [--iters 10]

VERDICT r3 weak #7 (scan = 49% of serial time) + the round-4 dispatch
discipline: no default flips without a stage-level e2e measurement. Two
knobs never covered by tools/ab_e2e.py's family toggles:

  - attention backend: the Pallas flash kernels engage by default for
    self-attn seq >= 512 (ops/attention.py) off r3 *standalone* wins —
    the same kind of evidence that shipped the r3 conv/GEMM regression.
  - sampler unroll: K=4 fully unrolled removes the while-loop overhead
    and lets XLA fuse each posterior update into the next step's input
    prep (diffusion/sampler.py:_scan_unroll).

Grid: {flash, xla} x {rolled, unroll=4} on the exact flagship scan stage
(4-step ControlNet+UNet spaced denoise, bs8, bf16). The JSON is rewritten
after every timing so a crash loses nothing.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RESULT = {"meta": {}, "configs": {}}
OUT = None


def flush():
    if OUT:
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(RESULT, f, indent=1, sort_keys=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "chip_queue", "ab_scan.json"))
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    global OUT
    OUT = args.out

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.ops.attention import set_attention_backend
    from edtr_tpu.utils.benchtime import timeit_chained as tc

    os.environ.setdefault("EDTR_ENTRY_SIZE", "full")
    BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
    RESULT["meta"] = {"devices": [str(d) for d in jax.devices()],
                      "batch": BATCH, "iters": args.iters,
                      "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}

    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=False)
    params = G._init_params(pipe, jax.random.PRNGKey(0), 512)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    c_txt = jnp.zeros((BATCH, pipe.cldm.clip.context_length,
                       pipe.cldm.clip.width), jnp.float32)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, 512, 512, 3))
    rng = jax.random.PRNGKey(231)

    pre = jax.jit(lambda p, x: pipe.pre_restore(p, x)).lower(
        params, lq).compile()(params, lq)
    z_pre = jax.jit(lambda p, x: pipe.cldm.vae_encode(
        p, x * 2 - 1, sample=False)).lower(params, pre).compile()(params, pre)

    def stage_scan(p, zp, key, unroll):
        cond = dict(c_txt=c_txt, c_img=zp)
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, zp.shape, zp.dtype)
        t = jnp.full((zp.shape[0],), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(zp, t, noise)
        return sample_scan(pipe.cldm.model_fn(p), pipe.schedule, z_T,
                           cond, k2, unroll=unroll)

    # round 5: the bigseq (2048..4096) forward variant joins the grid —
    # 'wholekv' (q-blocked full-row softmax, the new default) vs 'online'
    # (the r4 online-softmax kernel) vs pure XLA. unroll4 variants measured
    # NEGATIVE in r4 (ab_scan.json: -7%) and are dropped from the default
    # grid; EDTR_AB_SCAN_UNROLL4=1 restores them.
    grid = {
        "flash_wholekv_rolled": ("auto", 1, "wholekv"),
        "flash_online_rolled": ("auto", 1, "online"),
        "xla_rolled": ("xla", 1, "wholekv"),
    }
    if os.environ.get("EDTR_AB_SCAN_UNROLL4") == "1":
        grid["flash_wholekv_unroll4"] = ("auto", 4, "wholekv")
    ref = None
    for name, (backend, unroll, bigseq) in grid.items():
        try:
            set_attention_backend(backend)
            os.environ["EDTR_FLASH_BIGSEQ"] = bigseq
            t0 = time.time()
            ex = jax.jit(
                lambda p, zp, key: stage_scan(p, zp, key, unroll)
            ).lower(params, z_pre, rng).compile()
            compile_s = time.time() - t0
            out = ex(params, z_pre, rng)
            jax.block_until_ready(out)
            if ref is None:
                ref = out.astype(jnp.float32)
            else:
                # numerics guard: backends/unroll must agree (same rng path)
                err = float(jnp.abs(out.astype(jnp.float32) - ref).max())
                RESULT["configs"].setdefault(name, {})["max_abs_vs_base"] = \
                    round(err, 5)
            ms = tc(ex, params, z_pre, rng, iters=args.iters) * 1e3 / BATCH
            RESULT["configs"].setdefault(name, {}).update(
                ms_per_img=round(ms, 3), compile_s=round(compile_s, 1))
            print(f"scan [{name}]: {ms:.2f} ms/img (compile {compile_s:.0f}s)",
                  flush=True)
        except Exception as e:
            RESULT["configs"][name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"scan [{name}]: FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            set_attention_backend("auto")
            os.environ.pop("EDTR_FLASH_BIGSEQ", None)
        flush()

    base = RESULT["configs"].get("flash_wholekv_rolled", {}).get("ms_per_img")
    if base:
        RESULT["summary"] = {
            n: {"vs_default": round(base / v["ms_per_img"], 3)}
            for n, v in RESULT["configs"].items() if "ms_per_img" in v}
    flush()
    print(json.dumps(RESULT.get("summary", {})), flush=True)


if __name__ == "__main__":
    main()
