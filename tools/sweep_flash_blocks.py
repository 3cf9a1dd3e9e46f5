#!/usr/bin/env python
"""Block-size sweep for the flash attention kernels at the UNet ds=1 level.

The seq-4096 self-attention (8, 4096, 5, 64) measured ~27% MFU with the
default 512/512 blocks (tools/bench_attention.py). This sweeps Q/KV block
pairs by monkeypatching the module constants (read at trace time) and
timing with in-executable chained repeats. Prints one JSON line.

Env: EDTR_BENCH_BATCH (8), EDTR_BENCH_REPEATS (10), EDTR_BENCH_ITERS (5).
"""

import itertools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
REPEATS = int(os.environ.get("EDTR_BENCH_REPEATS", "10"))
ITERS = int(os.environ.get("EDTR_BENCH_ITERS", "5"))


def main():
    import jax
    import jax.numpy as jnp

    import edtr_tpu.ops.flash_attention as fa
    from edtr_tpu.utils.benchtime import timeit_chained

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (BATCH, 4096, 5, 64), jnp.bfloat16)
    k = jax.random.normal(ks[1], (BATCH, 4096, 5, 64), jnp.bfloat16)
    v = jax.random.normal(ks[2], (BATCH, 4096, 5, 64), jnp.bfloat16)
    flops = 2 * 2 * BATCH * 5 * 4096 * 4096 * 64  # two GEMMs

    def rep(fn):
        def run(q, k, v):
            def body(c, _):
                return fn(c, k, v).astype(c.dtype), None

            out, _ = jax.lax.scan(body, q, None, length=REPEATS)
            return out

        return jax.jit(run)

    results = {}
    ref = None
    for qb, kb in itertools.product((256, 512, 1024), (256, 512, 1024)):
        fa.Q_BLOCK, fa.KV_BLOCK = qb, kb
        fn = rep(lambda a, b, c: fa.flash_attention(a, b, c, 64 ** -0.5))
        try:
            out = fn(q, k, v)  # compile + sanity
            if ref is None:
                ref = out
            else:
                err = float(jnp.max(jnp.abs(
                    out.astype(jnp.float32) - ref.astype(jnp.float32))))
                assert err < 0.05, f"blocks {qb}/{kb} diverge: {err}"
            dt = timeit_chained(fn, q, k, v, iters=ITERS) / REPEATS
            results[f"q{qb}_kv{kb}"] = {
                "ms": round(dt * 1e3, 3),
                "mfu": round(flops / dt / 197e12, 3),
            }
        except Exception as e:  # VMEM overflow etc — record and move on
            results[f"q{qb}_kv{kb}"] = {"error": str(e).split("\n")[0][:120]}
        print(f"# q{qb}_kv{kb}: {results[f'q{qb}_kv{kb}']}",
              file=sys.stderr, flush=True)

    best = min((r["ms"], name) for name, r in results.items() if "ms" in r)
    print(json.dumps({
        "metric": f"flash block sweep (8,4096,5,64) bf16, {REPEATS}x repeats",
        "unit": "ms", "value": best[0], "best": best[1], "grid": results,
    }))


if __name__ == "__main__":
    main()
