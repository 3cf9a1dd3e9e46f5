#!/usr/bin/env python
"""Single-process whole-KV vs online flash A/B on the scan stage.

STATUS r5 cites a wholekv-vs-online e2e win; this harness produces the
artifact the honest way (see ab_swinir_pad.py): both backends compiled in
ONE process, timed interleaved over --reps rounds, medians reported, plus
on-chip output agreement. EDTR_FLASH_BIGSEQ is read at trace time
(ops/flash_attention.py:_bigseq_variant), so toggling the env between
jit compiles selects the backend per executable.

    python tools/ab_scan_bigseq.py [--iters 20] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "chip_queue", "ab_scan_bigseq.json"))
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.utils.benchtime import timeit_chained as tc

    os.environ.setdefault("EDTR_ENTRY_SIZE", "full")
    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=False)
    params = G._init_params(pipe, jax.random.PRNGKey(0), args.size)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    c_txt = jnp.zeros((args.batch, pipe.cldm.clip.context_length,
                       pipe.cldm.clip.width), jnp.float32)
    lq = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch, args.size, args.size, 3))
    rng = jax.random.PRNGKey(231)
    pre = jax.jit(lambda p, x: pipe.pre_restore(p, x))(params, lq)
    z_pre = jax.jit(lambda p, x: pipe.cldm.vae_encode(
        p, x * 2 - 1, sample=False))(params, pre)

    def stage_scan(p, zp, key):
        cond = dict(c_txt=c_txt, c_img=zp)
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, zp.shape, zp.dtype)
        t = jnp.full((zp.shape[0],), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(zp, t, noise)
        return sample_scan(pipe.cldm.model_fn(p), pipe.schedule, z_T,
                           cond, k2)

    result = {"meta": {"devices": [str(d) for d in jax.devices()],
                       "batch": args.batch, "size": args.size,
                       "iters": args.iters, "reps": args.reps,
                       "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
              "variants": {}}
    exes = {}
    outs = {}
    for name in ("wholekv", "online"):
        os.environ["EDTR_FLASH_BIGSEQ"] = name
        t0 = time.time()
        ex = jax.jit(lambda *a: stage_scan(*a)).lower(
            params, z_pre, rng).compile()
        cs = time.time() - t0
        outs[name] = ex(params, z_pre, rng)
        jax.block_until_ready(outs[name])
        exes[name] = ex
        result["variants"][name] = {"compile_s": round(cs, 1), "rounds": []}
        print(f"compiled {name} in {cs:.0f}s", flush=True)
    os.environ.pop("EDTR_FLASH_BIGSEQ", None)
    d = float(jnp.max(jnp.abs(outs["wholekv"].astype(jnp.float32)
                              - outs["online"].astype(jnp.float32))))
    result["max_abs_diff_wholekv_vs_online"] = d
    print(f"output agreement: max abs diff {d}", flush=True)

    for r in range(args.reps):
        for name, ex in exes.items():
            ms = tc(ex, params, z_pre, rng,
                    iters=args.iters) * 1e3 / args.batch
            result["variants"][name]["rounds"].append(round(ms, 3))
            print(f"round {r} {name}: {ms:.3f} ms/img", flush=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)

    for name, v in result["variants"].items():
        rr = sorted(v["rounds"])
        v["median_ms_per_img"] = rr[len(rr) // 2]
    w = result["variants"]["wholekv"]["median_ms_per_img"]
    o = result["variants"]["online"]["median_ms_per_img"]
    result["summary"] = {"wholekv_vs_online": round(o / w, 3)}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["summary"]), flush=True)


if __name__ == "__main__":
    main()
