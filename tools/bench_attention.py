#!/usr/bin/env python
"""Per-level attention micro-bench: XLA vs Pallas, fwd and bwd, on-chip.

VERDICT r2 weak #7: the flash dispatch threshold needs a measured artifact
covering EVERY UNet/ControlNet self-attention level at 512² EDTR, not one
4096 number. Levels (bs 8): ds=1 -> (8, 4096, 5, 64), ds=2 -> (8, 1024,
10, 64), ds=4 -> (8, 256, 20, 64); plus the 77-token cross-attention KV for
reference. Prints ONE JSON line mapping level -> {xla_ms, pallas_ms,
speedup} for forward and forward+backward.

Env: EDTR_BENCH_BATCH (8), EDTR_BENCH_ITERS (20).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
ITERS = int(os.environ.get("EDTR_BENCH_ITERS", "20"))

LEVELS = [  # (name, seq, heads) at 512² latent 64, head_dim 64
    ("ds1_seq4096", 4096, 5),
    ("ds2_seq1024", 1024, 10),
    ("ds4_seq256", 256, 20),
]


def main():
    import jax
    import jax.numpy as jnp

    from edtr_tpu.ops.attention import _xla_attention
    from edtr_tpu.ops.flash_attention import flash_attention, shapes_supported

    dtype = jnp.bfloat16
    scale = 64 ** -0.5
    results = {}

    from edtr_tpu.utils.benchtime import timeit_chained

    null_ms = None

    def timeit(fn, *args):
        # chained: independent re-dispatches do not serialize on the
        # tunneled chip (see edtr_tpu/utils/benchtime.py). The chain's
        # dependency ops cost ~1 ms/iter — comparable to these micro
        # kernels — so subtract a measured null-chain baseline (identity
        # fn, same arg shapes) from every reading.
        raw = timeit_chained(fn, *args, iters=ITERS) * 1e3  # ms
        return max(raw - (null_ms or 0.0), 1e-3)

    for name, seq, heads in LEVELS:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (BATCH, seq, heads, 64), dtype)
        k = jax.random.normal(ks[1], (BATCH, seq, heads, 64), dtype)
        v = jax.random.normal(ks[2], (BATCH, seq, heads, 64), dtype)

        if null_ms is None:
            null_ms = timeit_chained(
                jax.jit(lambda q, k, v: q + 0.0), q, k, v, iters=ITERS) * 1e3
            results["null_chain_ms"] = round(null_ms, 3)

        xla_f = jax.jit(lambda q, k, v: _xla_attention(q, k, v, scale))
        entry = {"xla_fwd_ms": round(timeit(xla_f, q, k, v), 3)}

        def loss_x(q, k, v):
            return _xla_attention(q, k, v, scale).astype(jnp.float32).sum()

        xla_b = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))
        entry["xla_fwdbwd_ms"] = round(timeit(xla_b, q, k, v), 3)

        if shapes_supported(q, k, v):
            pl_f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
            entry["pallas_fwd_ms"] = round(timeit(pl_f, q, k, v), 3)

            def loss_p(q, k, v):
                return flash_attention(q, k, v, scale).astype(jnp.float32).sum()

            pl_b = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))
            entry["pallas_fwdbwd_ms"] = round(timeit(pl_b, q, k, v), 3)
            entry["fwd_speedup"] = round(
                entry["xla_fwd_ms"] / entry["pallas_fwd_ms"], 2)
            entry["fwdbwd_speedup"] = round(
                entry["xla_fwdbwd_ms"] / entry["pallas_fwdbwd_ms"], 2)
        else:
            entry["pallas"] = "not dispatched (below MIN_SEQ; XLA wins)"
        results[name] = entry
        print(f"# {name}: {entry}", file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": f"attention micro-bench bs={BATCH} head_dim=64 bf16 "
                  "(XLA vs Pallas per UNet level)",
        "unit": "ms",
        "value": results.get("ds2_seq1024", {}).get(
            "pallas_fwd_ms", results["ds2_seq1024"]["xla_fwd_ms"]),
        "levels": results,
    }))


if __name__ == "__main__":
    main()
