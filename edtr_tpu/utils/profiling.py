"""Tracing / profiling helpers.

The reference has essentially no profiling (SURVEY.md §5.1 — a thop FLOPs
hook and ``SwinIR.flops()``). The TPU build gets first-class tools:

* :func:`flops_estimate` — XLA's own cost analysis for any jittable fn
  (replaces hand-written FLOPs counters);
* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-compatible trace;
* :func:`timeit` — steady-state wall-clock of a compiled fn.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict


def flops_estimate(fn: Callable, *args, **kwargs) -> Dict[str, float]:
    """Compile ``fn`` ahead-of-time and return XLA's cost analysis."""
    import jax

    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns a list per computation
        cost = cost[0] if cost else {}
    return {
        "flops": float(cost.get("flops", -1)),
        "bytes_accessed": float(cost.get("bytes accessed", -1)),
        "transcendentals": float(cost.get("transcendentals", -1)),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/edtr_trace"):
    """``with trace("/tmp/tb"):`` profile the enclosed device work."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def timeit(fn: Callable, *args, iters: int = 10, warmup: int = 1) -> float:
    """Steady-state seconds/call of a jitted fn.

    Serializes iterations through a data dependency: on the tunneled TPU,
    independent re-dispatches return instantly and ``block_until_ready``
    does not fence the device queue (measurements in
    ``edtr_tpu/utils/benchtime.py``). Falls back to the naive
    block-at-the-end loop when no floating arg is available to chain on
    (still correct on local CPU backends).
    """
    import jax

    from edtr_tpu.utils.benchtime import timeit_chained

    try:
        return timeit_chained(fn, *args, iters=iters)
    except ValueError:
        out = None
        for _ in range(warmup):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters


def nan_guard(tree: Any, name: str = "") -> None:
    """Host-side NaN sentinel (the reference's only sanitizer is the tiled
    VAE NaN check, utils/tilevae/tilevae.py:62-69 — here it is generic)."""
    import jax
    import jax.numpy as jnp

    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.isfinite(leaf).all()):
                raise FloatingPointError(
                    f"non-finite values in {name}{jax.tree_util.keystr(path)}"
                )
