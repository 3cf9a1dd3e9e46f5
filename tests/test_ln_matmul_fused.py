"""Fused LN+GEMM (ops/ln_matmul.py) vs reference; transformer-block parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edtr_tpu.models.attention import BasicTransformerBlock
from edtr_tpu.models.layers import LayerNorm
from edtr_tpu.ops import ln_matmul, geglu


def test_kernel_interpret_matches_ref(monkeypatch):
    g = np.random.default_rng(0)
    x = jnp.asarray(g.standard_normal((2, 512, 24)), jnp.float32)
    s = jnp.asarray(g.standard_normal(24), jnp.float32)
    b = jnp.asarray(g.standard_normal(24), jnp.float32)
    ws = [jnp.asarray(g.standard_normal((24, 32)) * 0.1, jnp.float32)
          for _ in range(3)]
    ref = ln_matmul._ref(x, s, b, *ws)
    monkeypatch.setattr(ln_matmul, "_FORCE_KERNEL", True)
    got = ln_matmul.ln_matmuls(x, s, b, *ws)
    for r, o in zip(ref, got):
        np.testing.assert_allclose(np.asarray(o), np.asarray(r), atol=1e-5)


def test_kernel_interpret_out_chunks(monkeypatch):
    monkeypatch.setattr(ln_matmul, "_MAX_OUT_TILE", 16)
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, 256, 24)), jnp.float32)
    s = jnp.asarray(g.standard_normal(24), jnp.float32)
    b = jnp.asarray(g.standard_normal(24), jnp.float32)
    w = jnp.asarray(g.standard_normal((24, 48)) * 0.1, jnp.float32)
    ref = ln_matmul._ref(x, s, b, w)
    monkeypatch.setattr(ln_matmul, "_FORCE_KERNEL", True)
    got = ln_matmul.ln_matmuls(x, s, b, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               atol=1e-5)


def test_ln_geglu_interpret_matches_ref(monkeypatch):
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 256, 16)), jnp.float32)
    s = jnp.asarray(g.standard_normal(16), jnp.float32)
    b = jnp.asarray(g.standard_normal(16), jnp.float32)
    args = [jnp.asarray(g.standard_normal(sh) * 0.1, jnp.float32)
            for sh in [(16, 32), (16, 32), (32,), (32,)]]
    ref = geglu._ln_ref(x, s, b, *args)
    monkeypatch.setattr(geglu, "_FORCE_KERNEL", True)
    got = geglu.ln_geglu_proj(x, s, b, *args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_affine_matmul_interpret_matches_ref(monkeypatch):
    g = np.random.default_rng(7)
    x = jnp.asarray(g.standard_normal((2, 512, 24)), jnp.float32)
    mul = jnp.asarray(g.standard_normal((2, 24)) * 0.5 + 1, jnp.float32)
    add = jnp.asarray(g.standard_normal((2, 24)) * 0.1, jnp.float32)
    w = jnp.asarray(g.standard_normal((24, 32)) * 0.1, jnp.float32)
    b = jnp.asarray(g.standard_normal(32), jnp.float32)
    ref = ln_matmul._aff_ref(x, mul, add, w, b)
    monkeypatch.setattr(ln_matmul, "_FORCE_KERNEL", True)
    got = ln_matmul.affine_matmul(x, mul, add, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_spatial_transformer_matches_legacy_math(monkeypatch):
    """Fused GN->proj_in entry == GroupNorm32 + dense, same param tree."""
    from edtr_tpu.models.attention import SpatialTransformer
    from edtr_tpu.models.layers import GroupNorm32

    st = SpatialTransformer(in_channels=64, n_heads=2, d_head=16,
                            context_dim=24)
    g = np.random.default_rng(8)
    x = jnp.asarray(g.standard_normal((2, 16, 16, 64)), jnp.float32)
    ctx = jnp.asarray(g.standard_normal((2, 77, 24)), jnp.float32)
    v = jax.jit(st.init)(jax.random.PRNGKey(0), x, ctx)
    p = v["params"]
    assert set(p["norm"].keys()) == {"scale", "bias"}
    assert p["proj_in"]["kernel"].shape == (64, 32)

    # legacy entry math from the same params
    gn = GroupNorm32(num_groups=32, epsilon=1e-6)
    xn = gn.apply({"params": p["norm"]}, x)
    want_entry = xn.reshape(2, 256, 64) @ p["proj_in"]["kernel"] \
        + p["proj_in"]["bias"]
    mul, add = __import__("edtr_tpu.ops.gn_conv", fromlist=["gn_fold"]) \
        .gn_fold(x, p["norm"]["scale"], p["norm"]["bias"], eps=1e-6)
    got_entry = ln_matmul.affine_matmul(
        x.reshape(2, 256, 64), mul, add,
        p["proj_in"]["kernel"], p["proj_in"]["bias"])
    np.testing.assert_allclose(np.asarray(got_entry), np.asarray(want_entry),
                               atol=2e-5)

    # full module runs and differentiates (perturb the zero-init proj_out
    # so gradients reach the inner blocks)
    out = jax.jit(st.apply)(v, x, ctx)
    assert out.shape == x.shape
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * g.standard_normal(a.shape).astype(a.dtype), p)
    grads = jax.jit(jax.grad(
        lambda pp: jnp.mean(st.apply({"params": pp}, x, ctx) ** 2)))(p)
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        assert float(jnp.abs(leaf).max()) > 0, jax.tree_util.keystr(path)


@pytest.fixture(scope="module")
def block_and_params():
    blk = BasicTransformerBlock(dim=32, n_heads=2, d_head=16, context_dim=24)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 256, 32)),
                    jnp.float32)
    ctx = jnp.asarray(np.random.default_rng(4).standard_normal((2, 77, 24)),
                      jnp.float32)
    v = jax.jit(blk.init)(jax.random.PRNGKey(0), x, ctx)
    return blk, v, x, ctx


def test_block_matches_legacy_math(block_and_params):
    """The restructured block == hand-computed legacy math, same params."""
    blk, v, x, ctx = block_and_params
    p = v["params"]

    def ln(t, q):
        mean = jnp.mean(t, -1, keepdims=True)
        var = jnp.mean(jnp.square(t - mean), -1, keepdims=True)
        return (t - mean) * jax.lax.rsqrt(var + 1e-5) * q["scale"] + q["bias"]

    def attn(q, h, ctx_):
        qq = h @ q["to_q"]["kernel"]
        kk = ctx_ @ q["to_k"]["kernel"]
        vv = ctx_ @ q["to_v"]["kernel"]
        b_, n, _ = qq.shape
        m = kk.shape[1]
        qq = qq.reshape(b_, n, 2, 16).transpose(0, 2, 1, 3)
        kk = kk.reshape(b_, m, 2, 16).transpose(0, 2, 1, 3)
        vv = vv.reshape(b_, m, 2, 16).transpose(0, 2, 1, 3)
        a = jax.nn.softmax((qq @ kk.transpose(0, 1, 3, 2)) * 16 ** -0.5, -1)
        o = (a @ vv).transpose(0, 2, 1, 3).reshape(b_, n, 32)
        return o @ q["to_out"]["kernel"] + q["to_out"]["bias"]

    h = ln(x, p["norm1"])
    y = x + attn(p["attn1"], h, h)
    h = ln(y, p["norm2"])
    y = y + attn(p["attn2"], h, ctx)
    h = ln(y, p["norm3"])
    proj = h @ p["ff"]["proj"]["kernel"] + p["ff"]["proj"]["bias"]
    a_, g_ = jnp.split(proj, 2, -1)
    ffo = (a_ * jax.nn.gelu(g_, approximate=False)) \
        @ p["ff"]["out"]["kernel"] + p["ff"]["out"]["bias"]
    want = y + ffo

    got = jax.jit(blk.apply)(v, x, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-5)


def test_block_grads_nonzero(block_and_params):
    blk, v, x, ctx = block_and_params

    def loss(p):
        return jnp.mean(blk.apply(p, x, ctx) ** 2)

    g = jax.jit(jax.grad(loss))(v)
    for path, leaf in jax.tree_util.tree_leaves_with_path(g):
        assert float(jnp.abs(leaf).max()) > 0, jax.tree_util.keystr(path)
