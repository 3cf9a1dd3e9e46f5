#!/usr/bin/env python
"""Single-process SwinIR pad/subpix A/B (round 5, VERDICT r4 #2).

The cross-file comparison (ab_e2e_swinir_i50.json yesterday vs
ab_e2e_swinir_pad.json today) straddles chip sessions; relay/chip state
drift can hide or fake a few-percent win. This harness times all four
(lane_pad x subpix) variants of the flagship SwinIR stage dispatch in ONE
process, interleaved A/B/A/B over `--reps` rounds, so every variant sees
the same chip state. Params are random per variant (timing only; the
exactness contract is golden-tested on CPU).

    python tools/ab_swinir_pad.py [--iters 30] [--reps 3]

One JSON artifact: per-variant ms/img per round + medians.
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
        REPO, "results", "chip_queue", "ab_swinir_pad.json"))
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from edtr_tpu.models.swinir import SwinIR
    from edtr_tpu.utils.benchtime import timeit_chained as tc

    lq = jax.random.uniform(
        jax.random.PRNGKey(1), (args.batch, args.size, args.size, 3))

    def build(pad):
        return SwinIR(
            img_size=64, patch_size=1, in_chans=3, embed_dim=180,
            depths=(6,) * 8, num_heads=(6,) * 8, window_size=8, mlp_ratio=2,
            sf=8, img_range=1.0, upsampler="nearest+conv",
            resi_connection="1conv", unshuffle=True, unshuffle_scale=8,
            dtype=jnp.bfloat16, lane_pad=pad,
        )

    variants = {
        "pad0": (0, "0"),
        "pad12": (12, "0"),
        "pad0_subpix": (0, "1"),
        "pad12_subpix": (12, "1"),
    }
    result = {"meta": {"devices": [str(d) for d in jax.devices()],
                       "batch": args.batch, "size": args.size,
                       "iters": args.iters, "reps": args.reps,
                       "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
              "variants": {}}

    exes = {}
    for name, (pad, subpix) in variants.items():
        os.environ["EDTR_UPS_SUBPIX"] = subpix
        net = build(pad)
        p = jax.jit(net.init)(jax.random.PRNGKey(0), lq[:1])["params"]
        p = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                         if a.dtype == jnp.float32 else a, p)
        t0 = time.time()
        ex = jax.jit(lambda pp, xx, _n=net: _n.apply(
            {"params": pp}, xx)).lower(p, lq).compile()
        cs = time.time() - t0
        jax.block_until_ready(ex(p, lq))
        exes[name] = (ex, p)
        result["variants"][name] = {"compile_s": round(cs, 1), "rounds": []}
        print(f"compiled {name} in {cs:.0f}s", flush=True)
    os.environ.pop("EDTR_UPS_SUBPIX", None)

    for r in range(args.reps):
        for name, (ex, p) in exes.items():
            ms = tc(ex, p, lq, iters=args.iters) * 1e3 / args.batch
            result["variants"][name]["rounds"].append(round(ms, 3))
            print(f"round {r} {name}: {ms:.3f} ms/img", flush=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)

    for name, v in result["variants"].items():
        rr = sorted(v["rounds"])
        v["median_ms_per_img"] = rr[len(rr) // 2]
    base = result["variants"]["pad0"]["median_ms_per_img"]
    result["summary"] = {
        name: {"vs_pad0": round(base / v["median_ms_per_img"], 3)}
        for name, v in result["variants"].items()}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["summary"]), flush=True)


if __name__ == "__main__":
    main()
