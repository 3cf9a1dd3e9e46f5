"""Mosaic-lowerability regression pins for the fused Pallas kernels.

jax.nn.gelu(approximate=False) lowers to ``lax.erfc``, which Mosaic has no
TPU lowering for — r3's queue run 1 disabled the swin kernels on exactly
that (the in-kernel erf polynomial fix landed mid-queue; VERDICT r3 weak
#4). These tests walk the traced jaxpr INCLUDING pallas_call sub-jaxprs
and assert no erf-family primitive is ever emitted inside a kernel body,
so the regression can't silently come back via a convenience call to
jax.nn.gelu inside kernel code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax.extend import core as jex_core


def _walk(jaxpr, prims: set):
    for eqn in jaxpr.eqns:
        prims.add(eqn.primitive.name)
        for v in eqn.params.values():
            for sub in _subjaxprs(v):
                _walk(sub, prims)


def _subjaxprs(v):
    if isinstance(v, jex_core.ClosedJaxpr):
        yield v.jaxpr
    elif isinstance(v, jex_core.Jaxpr):
        yield v
    elif isinstance(v, (list, tuple)):
        for item in v:
            yield from _subjaxprs(item)


def _kernel_prims(fn, *args) -> set:
    """All primitive names in pallas_call sub-jaxprs of fn's trace."""
    jaxpr = jax.make_jaxpr(fn)(*args)
    out = set()

    def find_pallas(jx):
        for eqn in jx.eqns:
            subs = [s for v in eqn.params.values() for s in _subjaxprs(v)]
            if eqn.primitive.name == "pallas_call":
                for s in subs:
                    _walk(s, out)
            else:
                for s in subs:
                    find_pallas(s)

    find_pallas(jaxpr.jaxpr)
    assert out, "expected at least one pallas_call in the trace"
    return out


_FORBIDDEN = {"erf", "erfc", "erf_inv"}


def test_swin_post_kernel_has_no_erf(monkeypatch):
    from edtr_tpu.ops import swin_block

    monkeypatch.setattr(swin_block, "_FORCE_KERNEL", True)
    h = w = 16
    win, c, hid = 8, 32, 64
    g = np.random.default_rng(0)
    nw = (h // win) * (w // win)
    attn = jnp.asarray(g.standard_normal((1, nw, win * win, c)), jnp.float32)
    xr = jnp.asarray(g.standard_normal((1, h * w, c)), jnp.float32)
    ws = [jnp.asarray(g.standard_normal(s) * 0.05, jnp.float32)
          for s in [(c, c), (c,), (c,), (c,), (c, hid), (hid,), (hid, c),
                    (c,)]]
    prims = _kernel_prims(
        lambda *a: swin_block.swin_post(*a, h, w, win), attn, xr, *ws)
    assert not (prims & _FORBIDDEN), prims & _FORBIDDEN


@pytest.mark.parametrize("with_ln", [False, True])
def test_geglu_kernel_has_no_erf(monkeypatch, with_ln):
    from edtr_tpu.ops import geglu

    monkeypatch.setattr(geglu, "_FORCE_KERNEL", True)
    n, c, inner = 256, 32, 128
    g = np.random.default_rng(1)
    x = jnp.asarray(g.standard_normal((1, n, c)), jnp.float32)
    wh = jnp.asarray(g.standard_normal((c, inner)) * 0.05, jnp.float32)
    wg = jnp.asarray(g.standard_normal((c, inner)) * 0.05, jnp.float32)
    bh = jnp.asarray(g.standard_normal(inner), jnp.float32)
    bg = jnp.asarray(g.standard_normal(inner), jnp.float32)
    if with_ln:
        s = jnp.asarray(g.standard_normal(c), jnp.float32)
        b = jnp.asarray(g.standard_normal(c), jnp.float32)
        fn = lambda *a: geglu.ln_geglu_proj(*a)
        args = (x, s, b, wh, wg, bh, bg)
    else:
        fn = lambda *a: geglu.geglu_proj(*a)
        args = (x, wh, wg, bh, bg)
    prims = _kernel_prims(fn, *args)
    assert not (prims & _FORBIDDEN), prims & _FORBIDDEN


def test_erf_polynomial_matches_exact_gelu():
    """The in-kernel polynomial must track torch-exact gelu well below
    bf16 resolution over the useful range."""
    from edtr_tpu.ops.geglu import _gelu_exact_f32

    x = jnp.linspace(-12.0, 12.0, 20001, dtype=jnp.float32)
    got = _gelu_exact_f32(x)
    want = jax.nn.gelu(x, approximate=False)
    assert float(jnp.max(jnp.abs(got - want))) < 3e-6
