#!/usr/bin/env python
"""On-chip check: scan_bodies_counted vs the TPU executable's cost analysis.

ADVICE r4 #3: the body-count model behind bench.py's unroll-aware MFU
normalization was verified empirically only on XLA:CPU; the TPU backend's
while-loop unroller could in principle differ. This asserts the model
against the REAL TPU backend's cost_analysis for the shipped and candidate
(K, unroll) configs. One JSON line; nonzero exit on mismatch.
"""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from edtr_tpu.diffusion.sampler import scan_bodies_counted

    assert jax.default_backend() != "cpu", "run on the TPU chip"

    def measured_bodies(n, unroll):
        def body(c, _):
            return c @ c, None

        def f(x):
            y, _ = jax.lax.scan(body, x, None, length=n, unroll=unroll)
            return y

        x = jnp.ones((256, 256), jnp.bfloat16)
        cost = jax.jit(f).lower(x).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        base = 2 * 256 ** 3
        return round(float(cost["flops"]) / base)

    configs = [(4, 1), (4, 2), (4, 4), (5, 2), (6, 4), (4, 3), (50, 1)]
    results, ok = {}, True
    for n, u in configs:
        want = scan_bodies_counted(n, u)
        got = measured_bodies(n, u)
        results[f"K{n}_u{u}"] = {"model": want, "tpu_cost_analysis": got}
        ok &= (want == got)
    print(json.dumps({"metric": "scan_bodies_counted vs TPU cost_analysis",
                      "ok": ok, "configs": results}))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
