"""Fused GEGLU projection (ops/geglu.py) vs the dense+split module math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edtr_tpu.models.attention import FeedForward
from edtr_tpu.ops import geglu


def _args(seq=256, c=16, inner=32, b=2, seed=0):
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.standard_normal((b, seq, c)), jnp.float32)
    wh = jnp.asarray(g.standard_normal((c, inner)) * 0.1, jnp.float32)
    wg = jnp.asarray(g.standard_normal((c, inner)) * 0.1, jnp.float32)
    bh = jnp.asarray(g.standard_normal(inner), jnp.float32)
    bg = jnp.asarray(g.standard_normal(inner), jnp.float32)
    return x, wh, wg, bh, bg


def test_kernel_interpret_matches_ref(monkeypatch):
    args = _args()
    ref = geglu._ref(*args)
    monkeypatch.setattr(geglu, "_FORCE_KERNEL", True)
    got = geglu.geglu_proj(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_kernel_interpret_column_chunks(monkeypatch):
    # inner > _COL_TILE exercises the column-chunked grid
    monkeypatch.setattr(geglu, "_COL_TILE", 16)
    args = _args(inner=48)
    ref = geglu._ref(*args)
    monkeypatch.setattr(geglu, "_FORCE_KERNEL", True)
    got = geglu.geglu_proj(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_feedforward_module_unchanged():
    """Fused FF == legacy dense+split math, same param tree."""
    ff = FeedForward(dim=16, mult=2)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 256, 16)),
                    jnp.float32)
    v = jax.jit(ff.init)(jax.random.PRNGKey(0), x)
    # legacy math from the same params
    kern = v["params"]["proj"]["kernel"]
    bias = v["params"]["proj"]["bias"]
    proj = x @ kern + bias
    h, gate = jnp.split(proj, 2, axis=-1)
    legacy = (h * jax.nn.gelu(gate, approximate=False)) \
        @ v["params"]["out"]["kernel"] + v["params"]["out"]["bias"]
    got = jax.jit(ff.apply)(v, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(legacy),
                               atol=2e-5)
    assert set(v["params"].keys()) == {"proj", "out"}
    assert kern.shape == (16, 64)


def test_grads_flow():
    ff = FeedForward(dim=16, mult=2)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((1, 256, 16)),
                    jnp.float32)
    v = jax.jit(ff.init)(jax.random.PRNGKey(0), x)

    def loss(p):
        return jnp.mean(ff.apply(p, x) ** 2)

    g = jax.jit(jax.grad(loss))(v)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert float(jnp.abs(leaf).max()) > 0, jax.tree_util.keystr(path)


def test_unsupported_seq_falls_back():
    ff = FeedForward(dim=16, mult=2)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 77, 16)),
                    jnp.float32)
    v = jax.jit(ff.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(ff.apply)(v, x)  # seq 77: dense path, must still work
    assert out.shape == (1, 77, 16)
