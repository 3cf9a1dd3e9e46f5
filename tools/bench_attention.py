#!/usr/bin/env python
"""Per-level attention micro-bench: XLA vs Pallas, fwd and bwd, on-chip.

VERDICT r2 weak #7: the flash dispatch threshold needs a measured artifact
covering EVERY UNet/ControlNet self-attention level at 512² EDTR, not one
4096 number. Levels (bs 8): ds=1 -> (8, 4096, 5, 64), ds=2 -> (8, 1024,
10, 64), ds=4 -> (8, 256, 20, 64). Prints ONE JSON line mapping level ->
{xla_ms, pallas_ms, speedup} for forward and forward+backward.

Measurement: per-dispatch tunnel latency (~1-4 ms) swamps these sub-3 ms
kernels, so each reading REPEATS the kernel inside one executable with a
``lax.scan`` whose carry feeds the previous output into the next input
(true serial chain, no dispatch between repeats), and divides the
executable's chained wall time (edtr_tpu/utils/benchtime.py) by the trip
count.

Env: EDTR_BENCH_BATCH (8), EDTR_BENCH_REPEATS (20), EDTR_BENCH_ITERS (5).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
REPEATS = int(os.environ.get("EDTR_BENCH_REPEATS", "20"))
ITERS = int(os.environ.get("EDTR_BENCH_ITERS", "5"))

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
    from edtr_tpu.utils.benchtime import timeit_chained

    dtype = jnp.bfloat16
    scale = 64 ** -0.5
    results = {}

    def repeat_fwd(attn_fn):
        """q -> attn -> q' -> attn ... REPEATS times inside one executable."""

        def run(q, k, v):
            def body(c, _):
                return attn_fn(c, k, v), None

            out, _ = jax.lax.scan(body, q, None, length=REPEATS)
            return out

        return jax.jit(run)

    def repeat_bwd(attn_fn):
        """Chained fwd+bwd: dq feeds the next iteration's q."""

        def loss(q, k, v):
            return attn_fn(q, k, v).astype(jnp.float32).sum()

        g = jax.grad(loss, argnums=(0, 1, 2))

        def run(q, k, v):
            def body(c, _):
                dq, dk, dv = g(c, k, v)
                # keep the carry well-scaled; dk/dv folded in to stay live
                return dq + (dk.ravel()[0] + dv.ravel()[0]) * 0, None

            out, _ = jax.lax.scan(body, q, None, length=REPEATS)
            return out

        return jax.jit(run)

    def timeit(fn, *args):
        return timeit_chained(fn, *args, iters=ITERS) * 1e3 / REPEATS  # ms/rep

    for name, seq, heads in LEVELS:
        ks = jax.random.split(jax.random.PRNGKey(0), 3)
        q = jax.random.normal(ks[0], (BATCH, seq, heads, 64), dtype)
        k = jax.random.normal(ks[1], (BATCH, seq, heads, 64), dtype)
        v = jax.random.normal(ks[2], (BATCH, seq, heads, 64), dtype)

        entry = {"xla_fwd_ms": round(timeit(repeat_fwd(
            lambda q, k, v: _xla_attention(q, k, v, scale)), q, k, v), 3)}
        entry["xla_fwdbwd_ms"] = round(timeit(repeat_bwd(
            lambda q, k, v: _xla_attention(q, k, v, scale)), q, k, v), 3)

        if shapes_supported(q, k, v):
            entry["pallas_fwd_ms"] = round(timeit(repeat_fwd(
                lambda q, k, v: flash_attention(q, k, v, scale)), q, k, v), 3)
            entry["pallas_fwdbwd_ms"] = round(timeit(repeat_bwd(
                lambda q, k, v: flash_attention(q, k, v, scale)), q, k, v), 3)
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
                  f"(XLA vs Pallas per UNet level, {REPEATS}x in-executable "
                  "chained repeats)",
        "unit": "ms",
        "value": results.get("ds2_seq1024", {}).get(
            "pallas_fwd_ms", results["ds2_seq1024"]["xla_fwd_ms"]),
        "levels": results,
    }))


if __name__ == "__main__":
    main()
