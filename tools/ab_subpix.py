#!/usr/bin/env python
"""Single-process subpixel-upsample A/B on the scan and decode stages.

The subpixel nearest+conv formulation (ops/gn_conv.py:_ups_subpixel,
round 5) covers the UNet decoder + VAE decoder upsamples through
`upsample_conv`; EDTR_UPS_SUBPIX is read at trace time, so one process
can compile both formulations and time them interleaved (same chip
state; see ab_swinir_pad.py for why cross-process A/Bs are unreliable).

    python tools/ab_subpix.py [--iters 20] [--reps 3]
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
        REPO, "results", "chip_queue", "ab_subpix.json"))
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
    from edtr_tpu.utils.image import wavelet_reconstruction

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

    def stage_decode(p, zz, pr):
        decoded = (pipe.cldm.vae_decode(p, zz) + 1) / 2
        return wavelet_reconstruction(decoded, pr).astype(jnp.bfloat16)

    z = jax.jit(stage_scan)(params, z_pre, rng)
    jax.block_until_ready(z)

    result = {"meta": {"devices": [str(d) for d in jax.devices()],
                       "batch": args.batch, "size": args.size,
                       "iters": args.iters, "reps": args.reps,
                       "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")},
              "stages": {}}
    plans = {
        "scan": (stage_scan, (params, z_pre, rng)),
        "decode": (stage_decode, (params, z, pre)),
    }
    exes = {}
    outs = {}
    for sname, (fn, sargs) in plans.items():
        result["stages"][sname] = {}
        for subpix in ("0", "1"):
            os.environ["EDTR_UPS_SUBPIX"] = subpix
            key = f"subpix{subpix}"
            t0 = time.time()
            ex = jax.jit(lambda *a, _f=fn: _f(*a)).lower(*sargs).compile()
            cs = time.time() - t0
            outs[(sname, subpix)] = ex(*sargs)
            jax.block_until_ready(outs[(sname, subpix)])
            exes[(sname, subpix)] = (ex, sargs)
            result["stages"][sname][key] = {"compile_s": round(cs, 1),
                                            "rounds": []}
            print(f"compiled {sname}/{key} in {cs:.0f}s", flush=True)
        d = float(jnp.max(jnp.abs(
            outs[(sname, "0")].astype(jnp.float32)
            - outs[(sname, "1")].astype(jnp.float32))))
        result["stages"][sname]["max_abs_diff"] = d
        print(f"{sname} subpix0-vs-1 max abs diff: {d}", flush=True)
    os.environ.pop("EDTR_UPS_SUBPIX", None)

    for r in range(args.reps):
        for (sname, subpix), (ex, sargs) in exes.items():
            ms = tc(ex, *sargs, iters=args.iters) * 1e3 / args.batch
            result["stages"][sname][f"subpix{subpix}"]["rounds"].append(
                round(ms, 3))
            print(f"round {r} {sname}/subpix{subpix}: {ms:.3f} ms/img",
                  flush=True)
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1, sort_keys=True)

    result["summary"] = {}
    for sname in plans:
        med = {}
        for subpix in ("0", "1"):
            rr = sorted(result["stages"][sname][f"subpix{subpix}"]["rounds"])
            med[subpix] = rr[len(rr) // 2]
            result["stages"][sname][f"subpix{subpix}"][
                "median_ms_per_img"] = med[subpix]
        result["summary"][sname] = {
            "subpix_vs_off": round(med["0"] / med["1"], 3)}
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result["summary"]), flush=True)


if __name__ == "__main__":
    main()
