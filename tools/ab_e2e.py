#!/usr/bin/env python
"""End-to-end per-stage A/B of the fused-kernel families on the real chip.

    python tools/ab_e2e.py [--out results/chip_queue/ab_e2e.json]
                           [--stages swinir,vae_encode,scan,decode]
                           [--iters 10]

VERDICT r3 weak #1: standalone per-shape wins did NOT predict stage-level
behavior (the sweep shipped a measured ~9% e2e regression). This harness
recompiles each flagship stage executable (the same split bench.py times)
under controlled env variants and reports steady-state ms/img per variant:

  - "off":   every family kill-switched (pure XLA; the pre-sweep graph)
  - "table": the shipped measured dispatch table (ops/dispatch.py)
  - "force": every family on wherever supported (the r3 behavior)
  - "no_<fam>": table with ONE family kill-switched (attribution)

A family earns default-on at a stage only if "table" <= "off" there. The
JSON artifact is rewritten after every timing so a crash loses nothing.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAMS = {
    "swin": "EDTR_SWIN_FUSED",
    "geglu": "EDTR_GEGLU_FUSED",
    "lnmm": "EDTR_LNMM_FUSED",
    "gnconv": "EDTR_GNCONV_FUSED",
    "ups": "EDTR_UPSCONV_FUSED",
}

# which families can matter per stage (bounds the compile count)
STAGE_FAMS = {
    "swinir": ["swin", "ups"],
    "vae_encode": ["gnconv", "lnmm"],
    "scan": ["geglu", "lnmm", "gnconv", "ups"],
    "decode": ["gnconv", "ups", "lnmm"],
}

RESULT = {"meta": {}, "stages": {}}
OUT = None


def flush():
    if OUT:
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "w") as f:
            json.dump(RESULT, f, indent=1, sort_keys=True)


def set_env(cfg: dict):
    for fam, var in FAMS.items():
        os.environ[var] = cfg.get(fam, "1")


def variants(stage):
    fams = STAGE_FAMS[stage]
    out = {
        "off": {f: "0" for f in FAMS},
        "table": {},
        "force": {f: "force" if f in fams else "1" for f in FAMS},
    }
    if len(fams) > 1:
        for f in fams:
            out[f"no_{f}"] = {f: "0"}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(
        REPO, "results", "chip_queue", "ab_e2e.json"))
    ap.add_argument("--stages", default="swinir,vae_encode,scan,decode")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--size", type=int, default=512,
                    help="input side; 1024 measures the big-image regime "
                         "the disabled kernel tiers were kept for "
                         "(VERDICT r4 next #7)")
    ap.add_argument("--batch", type=int,
                    default=int(os.environ.get("EDTR_BENCH_BATCH", "8")))
    ap.add_argument("--variants", default="",
                    help="comma list to restrict variants (e.g. off,table); "
                         "empty = all. Saves chip time when the families "
                         "are table-off anyway and the A/B axis is an "
                         "outer env knob (pad/subpix)")
    args = ap.parse_args()
    global OUT
    OUT = args.out
    want = args.stages.split(",")

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.utils.benchtime import timeit_chained as tc
    from edtr_tpu.utils.image import wavelet_reconstruction

    os.environ.setdefault("EDTR_ENTRY_SIZE", "full")
    BATCH = args.batch
    SIZE = args.size
    RESULT["meta"] = {"devices": [str(d) for d in jax.devices()],
                      "batch": BATCH, "size": SIZE, "iters": args.iters,
                      "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}

    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=False)
    params = G._init_params(pipe, jax.random.PRNGKey(0), SIZE)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        params)
    c_txt = jnp.zeros((BATCH, pipe.cldm.clip.context_length,
                       pipe.cldm.clip.width), jnp.float32)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    rng = jax.random.PRNGKey(231)

    # stage inputs (computed once, all families OFF: the pure-XLA path must
    # work at ANY size — a fused-kernel compile failure at an exotic size
    # must fail that VARIANT, not the harness setup; r5 ab_e2e_1024 lesson)
    set_env({f: "0" for f in FAMS})
    pre = jax.jit(lambda p, x: pipe.pre_restore(p, x)).lower(
        params, lq).compile()(params, lq)
    z_pre = jax.jit(lambda p, x: pipe.cldm.vae_encode(
        p, x * 2 - 1, sample=False)).lower(params, pre).compile()(params, pre)

    def stage_swinir(p, x):
        return pipe.pre_restore(p, x)

    def stage_encode(p, x):
        return pipe.cldm.vae_encode(p, x * 2 - 1, sample=False)

    def stage_scan(p, zp, key):
        cond = dict(c_txt=c_txt, c_img=zp)
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, zp.shape, zp.dtype)
        t = jnp.full((zp.shape[0],), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(zp, t, noise)
        return sample_scan(pipe.cldm.model_fn(p), pipe.schedule, z_T,
                           cond, k2)

    z = None

    def get_z():
        nonlocal z
        if z is None:
            set_env({f: "0" for f in FAMS})
            z = jax.jit(stage_scan).lower(params, z_pre, rng).compile()(
                params, z_pre, rng)
        return z

    def stage_decode(p, zz, pr):
        decoded = (pipe.cldm.vae_decode(p, zz) + 1) / 2
        return wavelet_reconstruction(decoded, pr).astype(jnp.bfloat16)

    stages = {
        "swinir": (stage_swinir, lambda: (params, lq)),
        "vae_encode": (stage_encode, lambda: (params, pre)),
        "scan": (stage_scan, lambda: (params, z_pre, rng)),
        "decode": (stage_decode, lambda: (params, get_z(), pre)),
    }

    for name in want:
        fn, argf = stages[name]
        sargs = argf()
        RESULT["stages"].setdefault(name, {})
        vs = variants(name)
        if args.variants:
            keep = set(args.variants.split(","))
            vs = {k: v for k, v in vs.items() if k in keep}
        for vname, cfg in vs.items():
            try:
                set_env(cfg)
                t0 = time.time()
                # fresh lambda per variant: jit caches key on fn identity
                ex = jax.jit(lambda *a: fn(*a)).lower(*sargs).compile()
                compile_s = time.time() - t0
                jax.block_until_ready(ex(*sargs))
                ms = tc(ex, *sargs, iters=args.iters) * 1e3 / BATCH
                RESULT["stages"][name][vname] = {
                    "ms_per_img": round(ms, 3),
                    "compile_s": round(compile_s, 1)}
                print(f"{name} [{vname}]: {ms:.2f} ms/img "
                      f"(compile {compile_s:.0f}s)", flush=True)
            except Exception as e:
                RESULT["stages"][name][vname] = {
                    "error": f"{type(e).__name__}: {e}"}
                print(f"{name} [{vname}]: FAILED {type(e).__name__}: {e}",
                      flush=True)
            finally:
                set_env({})
            flush()

    # summary: does the table beat pure XLA everywhere?
    summary = {}
    for name, vs in RESULT["stages"].items():
        t = vs.get("table", {}).get("ms_per_img")
        o = vs.get("off", {}).get("ms_per_img")
        if t and o:
            summary[name] = {"table_vs_off": round(o / t, 3)}
    RESULT["summary"] = summary
    flush()
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
