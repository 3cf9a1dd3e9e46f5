"""Reliable wall-clock timing for dispatched TPU computations.

On a local backend, the usual pattern — dispatch N independent calls, then
``jax.block_until_ready`` — measures steady-state throughput. Through a
remote-device tunnel (this environment's "axon" TPU), it does NOT:
independent dispatches of the same executable return instantly and
``block_until_ready`` does not fence the device queue. Measured on the
chip: a 4096^3 bf16 matmul "completes" in 0.02 ms per call — 30x above
the v5e's roofline peak — while the same matmul *chained* (each call
consuming the previous result) times at 3.3 ms/call, consistent with
roofline plus dispatch overhead.

Only data-dependent chains time truthfully. :func:`timeit_chained` forces
serial execution without changing values, shapes, or executables by
re-deriving one floating-point input each iteration from the previous
iteration's output through a zero-valued scalar::

    arg' = arg + 0 * out.ravel()[0]

The extra elementwise dispatch costs ~1 ms/iteration on the tunnel (warmed
before the timed window) — negligible against the multi-ms executables
this is used on, and included in the reported time like any dispatch cost.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

__all__ = ["timeit_chained"]

_warmed = False


def _warm_tunnel():
    """Absorb per-process cold-path costs before the first measurement.

    The first chained executable timed in a fresh process reads far slower
    than steady state (observed: the same 48-block SwinIR at 93 ms/img when
    timed first vs 10.8 ms/img inside a warmed process). Run a throwaway
    chained matmul loop once per process so no real reading is first.
    """
    global _warmed
    if _warmed:
        return
    _warmed = True
    f = jax.jit(lambda a: a @ a)
    x = jnp.ones((1024, 1024), jnp.bfloat16)
    out = f(x)
    for _ in range(30):
        out = f(x + (out.ravel()[0] * 0).astype(x.dtype))
    float(out.ravel()[0].astype(jnp.float32))


def _first_array(tree):
    for leaf in jax.tree.leaves(tree):
        if hasattr(leaf, "ravel"):
            return leaf
    raise ValueError("output pytree contains no array to chain on")


def _dep_args(base_args, out):
    """Copy of ``base_args`` with one floating arg made dependent on ``out``."""
    eps = _first_array(out).ravel()[0] * 0
    new = list(base_args)
    for j, a in enumerate(new):
        if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating):
            new[j] = a + eps.astype(a.dtype)
            return tuple(new)
    raise ValueError(
        "no floating-point array argument to chain through; pass one "
        "explicitly or restructure the timed fn")


def timeit_chained(fn, *args, iters: int = 10) -> float:
    """Average seconds per call of ``fn(*args)``, serialized via data deps.

    ``fn`` must accept the same argument shapes/dtypes every call (jitted or
    AOT-compiled executables both work) and at least one positional arg must
    be a floating-point ``jax.Array``.
    """
    _warm_tunnel()
    out = fn(*args)
    a2 = _dep_args(args, out)
    out = fn(*a2)  # warm the dependency-op dispatch path
    a2 = _dep_args(args, out)
    jax.block_until_ready(jax.tree.leaves(out))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*a2)
        a2 = _dep_args(args, out)
    # scalar readback: the only force the tunnel honors unconditionally;
    # the chain makes it transitively cover every timed iteration
    float(_first_array(out).ravel()[0].astype(jnp.float32))
    return (time.time() - t0) / iters
