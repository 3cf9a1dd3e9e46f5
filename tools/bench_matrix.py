#!/usr/bin/env python
"""On-chip comparison-matrix bench: EDTR-s1 / EDTR-s4 / DiffBIR-50 / SwinIR.

The reference's scientific story is the method MATRIX, not just the
flagship (VERDICT r2 #6): oracle / no-restoration / SwinIR-only / DiffBIR /
EDTR-sK all share the task nets but differ in restoration cost:

* EDTR-s1 — ONE ControlNet+UNet forward (timestep [200];
  ``/root/reference/configs/det/voc2012/test/006_edtr-s1.yaml:125``,
  num_timesteps: 1),
* EDTR-s4 — 4 forwards (the flagship; timesteps [50,100,150,200]),
* DiffBIR — 50 spaced sampler steps from pure noise
  (``/root/reference/main/det/train_diffbir.py:178-182``),
* swinir-only — pre-restoration net alone.

Prints ONE JSON line with compile + steady-state numbers for each at
512x512 bf16 (restore path only — the detector is a shared constant across
the matrix and is measured by bench.py).

Env: EDTR_BENCH_BATCH (4), EDTR_BENCH_ITERS (5),
EDTR_MATRIX_VARIANTS (comma list; default "swinir,edtr-s1,edtr-s4,diffbir50").
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("EDTR_ENTRY_SIZE", "full")

BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "4"))
ITERS = int(os.environ.get("EDTR_BENCH_ITERS", "5"))
VARIANTS = os.environ.get(
    "EDTR_MATRIX_VARIANTS", "swinir,edtr-s1,edtr-s4,diffbir50"
).split(",")


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from edtr_tpu.pipeline import EDTRPipeline

    tiny = jax.default_backend() == "cpu"
    size = 64 if tiny else 512

    base = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=tiny)
    params = G._init_params(base, jax.random.PRNGKey(0), size)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    c_txt = jnp.zeros(
        (BATCH, base.cldm.clip.context_length, base.cldm.clip.width), jnp.float32
    )
    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, size, size, 3))
    rng = jax.random.PRNGKey(231)

    def pipe_steps(k):
        return EDTRPipeline(base.swinir, base.cldm, base.diffusion,
                            start_timestep=200, num_timesteps=k)

    def build(variant):
        if variant == "swinir":
            return lambda p, x, r: base.pre_restore(p, x)
        if variant == "edtr-s1":
            pipe = pipe_steps(1)
            return lambda p, x, r: pipe.restore(p, x, r, c_txt=c_txt)["restored"]
        if variant == "edtr-s4":
            pipe = pipe_steps(4)
            return lambda p, x, r: pipe.restore(p, x, r, c_txt=c_txt)["restored"]
        if variant == "diffbir50":
            # DiffBIR eval: 50-step spaced sampling from PURE NOISE,
            # conditioned on the swinir latent (train_diffbir.py:178-182);
            # decode + wavelet identical to EDTR
            from edtr_tpu.diffusion.sampler import sample_scan
            from edtr_tpu.utils.image import wavelet_reconstruction

            schedule = base.sampler.make_schedule(50)

            def run(p, x, r):
                pre = base.pre_restore(p, x)
                z_pre = base.cldm.vae_encode(p, pre * 2 - 1, sample=False)
                cond = dict(c_txt=c_txt, c_img=z_pre)
                r1, r2 = jax.random.split(r)
                x_T = jax.random.normal(r1, z_pre.shape, z_pre.dtype)
                z = sample_scan(base.cldm.model_fn(p), schedule, x_T, cond, r2)
                decoded = (base.cldm.vae_decode(p, z) + 1) / 2
                return wavelet_reconstruction(decoded, pre)

            return run
        raise ValueError(variant)

    def _flops(compiled):
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0] if cost else {}
            return float(cost.get("flops", 0.0))
        except Exception:
            return 0.0

    # XLA cost analysis counts a lax.scan body ONCE regardless of trip
    # count, so the K-step sampler's flops must be corrected by
    # (K-1) x one ControlNet+UNet forward — measured from its own AOT
    # compile (shared across variants; dominant for DiffBIR's K=50).
    lat = size // 8
    z0 = jnp.zeros((BATCH, lat, lat, 4), jnp.bfloat16)
    cond0 = {"c_txt": c_txt, "c_img": z0}
    t0s = jnp.zeros((BATCH,), jnp.int32)
    model_flops = _flops(
        jax.jit(lambda p, z, t: base.cldm.model_fn(p)(z, t, cond0))
        .lower(params, z0, t0s).compile())
    scan_steps = {"swinir": 0, "edtr-s1": 1, "edtr-s4": 4, "diffbir50": 50}

    results = {}
    for variant in VARIANTS:
        variant = variant.strip()
        fn = build(variant)
        t0 = time.time()
        compiled = jax.jit(fn).lower(params, lq, rng).compile()
        t_compile = time.time() - t0
        flops = _flops(compiled)
        if flops:
            # the sampler body is counted once per HLO copy —
            # scan_bodies_counted(K) of them when EDTR_SCAN_UNROLL is set
            from edtr_tpu.diffusion.sampler import scan_bodies_counted

            K = scan_steps.get(variant, 1)
            flops += max(K - scan_bodies_counted(max(K, 1)), 0) * model_flops
        # chained timing: independent re-dispatches do not serialize on the
        # tunneled chip (edtr_tpu/utils/benchtime.py documents the
        # measurements); feed lq through a zero scalar of the previous
        # output so every iteration truly executes inside the timed window
        from edtr_tpu.utils.benchtime import timeit_chained

        dt = timeit_chained(
            lambda p, x, r: compiled(p, x, r), params, lq, rng, iters=ITERS)
        sink = float(compiled(params, lq, rng).astype(jnp.float32).mean())
        kind = jax.devices()[0].device_kind.lower()
        peak = 197e12 if ("v5 lite" in kind or "v5e" in kind) else (
            459e12 if "v5p" in kind else 275e12 if "v4" in kind else 197e12)
        results[variant] = {
            "img_per_sec": round(BATCH / dt, 3),
            "ms_per_img": round(dt * 1e3 / BATCH, 2),
            "compile_sec": round(t_compile, 1),
            "mfu": round((flops / dt) / peak, 4) if flops else -1.0,
            "tflops_per_img": round(flops / BATCH / 1e12, 2),
        }
        print(f"# {variant}: {results[variant]}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"restore matrix {size}x{size} bs={BATCH} bf16 "
                  "(swinir-only / EDTR-s1 / EDTR-s4 / DiffBIR-50-from-noise)",
        "unit": "images/sec/chip",
        "value": results.get("edtr-s4", {}).get("img_per_sec", -1),
        "variants": results,
    }))


if __name__ == "__main__":
    main()
