"""Fused window attention (ops/window_attention.py).

The Pallas kernel is exercised in interpret mode on CPU against the
broadcast-XLA reference (itself covered transitively by the SwinIR torch
goldens, tests/test_swinir_golden.py). Gradients go through the custom VJP.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edtr_tpu.ops.window_attention import (
    _bwd_math,
    _pick_g,
    _win_fwd,
    _xla_reference,
    window_attention,
)


def _mats(bw=16, n=64, h=3, d=30, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 5)
    q = jax.random.normal(ks[0], (bw, n, h, d), dtype)
    k = jax.random.normal(ks[1], (bw, n, h, d), dtype)
    v = jax.random.normal(ks[2], (bw, n, h, d), dtype)
    bias = jax.random.normal(ks[3], (h, n, n), jnp.float32) * 0.1
    return q, k, v, bias, ks[4]


@pytest.mark.parametrize("nw_mask", [None, 4, 16])
def test_kernel_matches_xla_reference(nw_mask):
    q, k, v, bias, key = _mats()
    mask = None
    if nw_mask is not None:
        mask = jnp.where(
            jax.random.uniform(key, (nw_mask, 64, 64)) > 0.7, -100.0, 0.0)
    ref = _xla_reference(q, k, v, bias, mask, 30 ** -0.5)
    got = _win_fwd(q, k, v, bias, mask, 30 ** -0.5)  # interpret=True on CPU
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_bf16_close():
    q, k, v, bias, _ = _mats(dtype=jnp.bfloat16)
    ref = _xla_reference(q, k, v, bias, None, 30 ** -0.5)
    got = _win_fwd(q, k, v, bias, None, 30 ** -0.5)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_odd_window_count_dispatches_g1():
    # 3 windows per image is coprime with every larger G
    assert _pick_g(6, 3) == 1
    q, k, v, bias, key = _mats(bw=6, n=16, h=2, d=8)
    mask = jnp.where(jax.random.uniform(key, (3, 16, 16)) > 0.5, -100.0, 0.0)
    ref = _xla_reference(q, k, v, bias, mask, 8 ** -0.5)
    got = _win_fwd(q, k, v, bias, mask, 8 ** -0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_custom_vjp_matches_autodiff_reference():
    q, k, v, bias, key = _mats(bw=8, n=16, h=2, d=8)
    mask = jnp.where(jax.random.uniform(key, (4, 16, 16)) > 0.5, -100.0, 0.0)

    def loss_fused(q, k, v, bias):
        return (window_attention(q, k, v, bias, mask) ** 2).sum()

    def loss_ref(q, k, v, bias):
        return (_xla_reference(q, k, v, bias, mask, 8 ** -0.5) ** 2).sum()

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_bwd_math_bias_grad_shape():
    q, k, v, bias, _ = _mats(bw=4, n=16, h=2, d=8)
    dout = jnp.ones_like(q)
    dq, dk, dv, dbias = _bwd_math(q, k, v, bias, None, 8 ** -0.5, dout)
    assert dq.shape == q.shape and dk.shape == k.shape and dv.shape == v.shape
    assert dbias.shape == bias.shape
