"""Chained-timing helper (edtr_tpu/utils/benchtime.py).

The helper serializes repeated dispatches through a zero-valued data
dependency — the only pattern that times truthfully on the tunneled TPU
(independent re-dispatches return instantly there). On CPU it must still
produce sane wall-clock numbers and preserve the timed fn's semantics.
"""

import jax
import jax.numpy as jnp
import pytest

from edtr_tpu.utils.benchtime import _dep_args, timeit_chained


def test_times_a_jitted_fn():
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones((64, 64), jnp.float32)
    dt = timeit_chained(f, x, iters=3)
    assert dt > 0


def test_dep_args_preserves_values():
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.full((8,), 3.0)
    out = f(x)
    (x2,) = _dep_args((x,), out)
    assert jnp.allclose(x2, x)  # zero-valued dependency: same numbers
    assert x2.dtype == x.dtype


def test_skips_non_float_and_pytree_args():
    # params dict (pytree) and int arrays must be skipped; the float array
    # anywhere in the positional list is the chain carrier
    f = jax.jit(lambda params, idx, x: x * params["w"] + idx.sum())
    params = {"w": jnp.float32(2.0)}
    idx = jnp.arange(4)
    x = jnp.ones((4,), jnp.float32)
    out = f(params, idx, x)
    new = _dep_args((params, idx, x), out)
    assert new[0] is params and new[1] is idx
    assert jnp.allclose(new[2], x)


def test_raises_without_float_carrier():
    f = jax.jit(lambda i: i + 1)
    with pytest.raises(ValueError):
        timeit_chained(f, jnp.arange(3), iters=2)
