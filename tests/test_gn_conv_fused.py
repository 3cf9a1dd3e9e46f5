"""Fused GN+SiLU+conv3x3 (ops/gn_conv.py) vs reference math and the legacy
ResBlock module path (reference ``model/unet.py:110-223``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edtr_tpu.models.layers import GroupNorm32
from edtr_tpu.models.unet import ResBlock
from edtr_tpu.ops import gn_conv


def _args(b=2, h=16, w=8, cin=64, cout=128, emb=True, res=True, seed=0):
    g = np.random.default_rng(seed)
    x = jnp.asarray(g.standard_normal((b, h, w, cin)), jnp.float32)
    mul = jnp.asarray(g.standard_normal((b, cin)) * 0.5 + 1.0, jnp.float32)
    add = jnp.asarray(g.standard_normal((b, cin)) * 0.1, jnp.float32)
    wk = jnp.asarray(g.standard_normal((3, 3, cin, cout)) * 0.05, jnp.float32)
    bk = jnp.asarray(g.standard_normal(cout) * 0.1, jnp.float32)
    e = jnp.asarray(g.standard_normal((b, cout)) * 0.2,
                    jnp.float32) if emb else None
    r = jnp.asarray(g.standard_normal((b, h, w, cout)),
                    jnp.float32) if res else None
    return x, mul, add, wk, bk, e, r


@pytest.mark.parametrize("emb,res", [(True, True), (True, False),
                                     (False, True), (False, False)])
def test_kernel_interpret_matches_ref(monkeypatch, emb, res):
    """Whole-image tier (band pinned off — dispatch prefers band at h>=16)."""
    args = _args(emb=emb, res=res)
    ref = gn_conv._ref(*args)
    monkeypatch.setattr(gn_conv, "_BAND_BUDGET", 100)
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    got = gn_conv.gn_silu_conv(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_kernel_interpret_chunked_grid(monkeypatch):
    """Small budget forces out-channel (j) and row (r) splits."""
    args = _args(h=32, w=8, cin=64, cout=256, seed=1)
    ref = gn_conv._ref(*args)
    monkeypatch.setattr(gn_conv, "_BAND_BUDGET", 100)
    monkeypatch.setattr(gn_conv, "_BUDGET", 1_100_000)
    plan = gn_conv._plan(32, 8, 64, 256, True, es=4)
    assert plan is not None and (plan[0] < 32 or plan[1] < 256), plan
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    got = gn_conv.gn_silu_conv(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_kernel_interpret_nonsquare(monkeypatch):
    args = _args(h=8, w=24, cin=32, cout=64, seed=2)
    ref = gn_conv._ref(*args)
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    got = gn_conv.gn_silu_conv(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("emb,res", [(True, True), (True, False),
                                     (False, True), (False, False)])
def test_band_kernel_interpret_matches_ref(monkeypatch, emb, res):
    """Whole-image budget zeroed -> streaming-band tier; halo rows are the
    correctness risk, so h spans 4 row blocks."""
    args = _args(h=32, w=8, cin=64, cout=128, emb=emb, res=res, seed=6)
    ref = gn_conv._ref(*args)
    monkeypatch.setattr(gn_conv, "_BUDGET", 100)
    assert gn_conv._band_plan(32, 8, 64, 128, res, es=4) is not None
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    got = gn_conv.gn_silu_conv(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_band_kernel_interpret_col_chunks(monkeypatch):
    args = _args(h=16, w=8, cin=64, cout=256, seed=7)
    ref = gn_conv._ref(*args)
    monkeypatch.setattr(gn_conv, "_BUDGET", 100)
    monkeypatch.setattr(gn_conv, "_BAND_BUDGET", 800_000)
    plan = gn_conv._band_plan(16, 8, 64, 256, True, es=4)
    assert plan is not None and plan[1] < 256, plan
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    got = gn_conv.gn_silu_conv(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.parametrize("act", [None, "lrelu"])
def test_upsample_conv_interpret_matches_ref(monkeypatch, act):
    g = np.random.default_rng(11)
    x = jnp.asarray(g.standard_normal((2, 16, 8, 32)), jnp.float32)
    w = jnp.asarray(g.standard_normal((3, 3, 32, 64)) * 0.05, jnp.float32)
    b = jnp.asarray(g.standard_normal(64) * 0.1, jnp.float32)
    ref = gn_conv._ups_ref(x, w, b, act)
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    assert gn_conv._ups_plan(32, 16, 32, 64, es=4) is not None
    got = gn_conv.upsample_conv(x, w, b, act)
    assert got.shape == (2, 32, 16, 64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_upsample_conv_grads_and_chunks(monkeypatch):
    g = np.random.default_rng(12)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 32)), jnp.float32)
    w = jnp.asarray(g.standard_normal((3, 3, 32, 256)) * 0.05, jnp.float32)
    b = jnp.asarray(g.standard_normal(256) * 0.1, jnp.float32)
    ref = gn_conv._ups_ref(x, w, b, None)
    monkeypatch.setattr(gn_conv, "_BAND_BUDGET", 500_000)
    plan = gn_conv._ups_plan(16, 16, 32, 256, es=4)
    assert plan is not None and plan[1] < 256, plan
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    got = gn_conv.upsample_conv(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    gk = jax.jit(jax.grad(
        lambda x, w, b: (gn_conv.upsample_conv(x, w, b) ** 2).mean(),
        argnums=(0, 1, 2)))(x, w, b)
    gr = jax.jit(jax.grad(
        lambda x, w, b: (gn_conv._ups_ref(x, w, b, None) ** 2).mean(),
        argnums=(0, 1, 2)))(x, w, b)
    for a, r in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-5)


def test_upsample_plans():
    """VAE decoder upsample shapes ride the fused kernel (strict_lanes=True
    pins real-TPU dispatch: HBM DMA lane slices must be 128-aligned)."""
    S = dict(strict_lanes=True)
    assert gn_conv._ups_plan(512, 512, 256, 256, **S) is not None  # VAE up_1
    assert gn_conv._ups_plan(256, 256, 512, 512, **S) is not None  # VAE up_2
    assert gn_conv._ups_plan(128, 128, 512, 512, **S) is not None  # VAE up_3
    assert gn_conv._ups_plan(64, 64, 640, 640, **S) is not None    # UNet
    # SwinIR's 64-channel tail: lane rule rejects on TPU (XLA fallback),
    # interpret mode may still exercise it
    assert gn_conv._ups_plan(512, 512, 64, 64, **S) is None
    assert gn_conv._ups_plan(512, 512, 64, 64, strict_lanes=False) is not None
    assert gn_conv._ups_plan(14, 14, 64, 64) is None          # odd: fallback


def test_gn_fold_matches_groupnorm32():
    """x*mul+add == GroupNorm32 apply, same channel-sum stat formulation."""
    g = np.random.default_rng(3)
    x = jnp.asarray(g.standard_normal((2, 8, 8, 64)), jnp.float32)
    gn = GroupNorm32(num_groups=32)
    v = gn.init(jax.random.PRNGKey(0), x)
    v = jax.tree_util.tree_map(
        lambda a: a + 0.1 * g.standard_normal(a.shape).astype(a.dtype), v)
    ref = gn.apply(v, x)
    mul, add = gn_conv.gn_fold(x, v["params"]["scale"], v["params"]["bias"])
    got = x * mul[:, None, None, :] + add[:, None, None, :]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("cout", [64, 128])  # 64 = identity skip path
def test_resblock_fused_matches_legacy(monkeypatch, cout):
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    g = np.random.default_rng(4)
    x = jnp.asarray(g.standard_normal((2, 16, 8, 64)), jnp.float32)
    emb = jnp.asarray(g.standard_normal((2, 96)), jnp.float32)
    bf = ResBlock(out_channels=cout, fused=True)
    bl = ResBlock(out_channels=cout, fused=False)
    p = jax.jit(bl.init)(jax.random.PRNGKey(2), x, emb)["params"]
    # randomize the zero-init out_conv so the second half is exercised
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * g.standard_normal(a.shape).astype(a.dtype), p)
    pf = jax.jit(bf.init)(jax.random.PRNGKey(2), x, emb)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    of = jax.jit(lambda p, x, e: bf.apply({"params": p}, x, e))(p, x, emb)
    ol = jax.jit(lambda p, x, e: bl.apply({"params": p}, x, e))(p, x, emb)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ol), atol=3e-6)

    gf = jax.jit(jax.grad(
        lambda p, x, e: (bf.apply({"params": p}, x, e) ** 2).mean()))(
            p, x, emb)
    gl = jax.jit(jax.grad(
        lambda p, x, e: (bl.apply({"params": p}, x, e) ** 2).mean()))(
            p, x, emb)
    for (path, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gf),
                                 jax.tree_util.tree_leaves_with_path(gl)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path))
        assert float(jnp.abs(jnp.asarray(b)).max()) > 0, \
            jax.tree_util.keystr(path)


@pytest.mark.parametrize("cout", [32, 64])  # 32 = identity-shortcut path
def test_vae_resnetblock_fused_matches_legacy(monkeypatch, cout):
    from edtr_tpu.models.vae import ResnetBlock

    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    g = np.random.default_rng(9)
    x = jnp.asarray(g.standard_normal((2, 16, 8, 32)), jnp.float32)
    bf = ResnetBlock(out_channels=cout, fused=True)
    bl = ResnetBlock(out_channels=cout, fused=False)
    p = jax.jit(bl.init)(jax.random.PRNGKey(2), x)["params"]
    p = jax.tree_util.tree_map(
        lambda a: a + 0.05 * g.standard_normal(a.shape).astype(a.dtype), p)
    pf = jax.jit(bf.init)(jax.random.PRNGKey(2), x)["params"]
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(pf))
    of = jax.jit(lambda p, x: bf.apply({"params": p}, x))(p, x)
    ol = jax.jit(lambda p, x: bl.apply({"params": p}, x))(p, x)
    np.testing.assert_allclose(np.asarray(of), np.asarray(ol), atol=3e-6)
    gf = jax.jit(jax.grad(
        lambda p, x: (bf.apply({"params": p}, x) ** 2).mean()))(p, x)
    gl = jax.jit(jax.grad(
        lambda p, x: (bl.apply({"params": p}, x) ** 2).mean()))(p, x)
    for (path, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(gf),
                                 jax.tree_util.tree_leaves_with_path(gl)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_vae_resnetblock_fused_sows_gn_stats(monkeypatch):
    """The tiled-VAE sync contract: fused blocks still sow gn_stats and
    honor injected gn_moments (GroupNorm32 fold mode)."""
    from edtr_tpu.models.vae import ResnetBlock

    g = np.random.default_rng(10)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 32)), jnp.float32)
    blk = ResnetBlock(out_channels=32, fused=True)
    v = blk.init(jax.random.PRNGKey(0), x)
    out, state = blk.apply({"params": v["params"]}, x, mutable=["gn_stats"])
    stats = state["gn_stats"]
    assert "norm1" in stats and "norm2" in stats
    count, s1, s2 = stats["norm1"]["stats"]
    assert float(count) == 8 * 8 * 1  # HW * C/G for C=32, G=32
    # inject the self-consistent moments: output must be unchanged
    mean1 = s1 / count
    var1 = s2 / count - jnp.square(mean1)
    out2 = blk.apply(
        {"params": v["params"],
         "gn_moments": {"norm1": {"mean": mean1, "var": var1}}},
        x, mutable=["gn_stats"])[0]
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), atol=2e-5)


def test_vae_decoder_band_plans():
    """The 512²/256² VAE decoder blocks ride the band tier (bf16), pinned
    at real-TPU dispatch (strict_lanes=True)."""
    S = dict(strict_lanes=True)
    assert gn_conv._band_plan(512, 512, 128, 128, True, **S) is not None
    assert gn_conv._band_plan(512, 512, 256, 128, True, **S) is not None
    assert gn_conv._band_plan(256, 256, 512, 256, True, **S) is not None
    assert gn_conv._band_plan(128, 128, 512, 512, True, **S) is not None
    assert gn_conv.supported(64, 64, 512, 512, **S)


def test_flagship_plans():
    """The plans the probe/bench rely on, pinned at real-TPU dispatch:
    supported hot shapes stay supported, lane-rule and oversize shapes fall
    back (never a surprise compile). On-chip validation: smoke_kernels_chip
    (all four UNet levels + VAE/SwinIR upsample + proj kernels)."""
    S = dict(strict_lanes=True)
    # UNet level-0 (cin=320) violates the HBM DMA lane rule -> XLA fallback
    assert not gn_conv.supported(64, 64, 320, 320, **S)
    assert gn_conv.supported(64, 64, 320, 320, strict_lanes=False)
    assert gn_conv.supported(32, 32, 640, 640, **S)
    assert gn_conv.supported(16, 16, 1280, 1280, **S)
    assert gn_conv.supported(8, 8, 1280, 1280, **S)
    # 64² decoder concat blocks: 640-in rides the band tier (full-cout
    # out block), 960-in violates the lane rule
    assert gn_conv._plan(64, 64, 640, 320, True, **S) is None
    assert gn_conv._band_plan(64, 64, 640, 320, True, **S) is not None
    assert gn_conv._band_plan(64, 64, 960, 320, True, **S) is None
    assert not gn_conv.supported(16, 16, 2560, 1280, **S)  # XLA fallback
    # VAE decode scale fits the band tier
    assert gn_conv._band_plan(512, 512, 128, 128, True, **S) is not None


def test_unsupported_falls_back(monkeypatch):
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    monkeypatch.setattr(gn_conv, "_BUDGET", 100)  # nothing fits -> ref path
    monkeypatch.setattr(gn_conv, "_BAND_BUDGET", 100)
    args = _args(seed=5)
    assert gn_conv._plan(16, 8, 64, 128, True, es=4) is None
    assert gn_conv._band_plan(16, 8, 64, 128, True, es=4) is None
    got = gn_conv.gn_silu_conv(*args)
    np.testing.assert_allclose(np.asarray(got),
                               np.asarray(gn_conv._ref(*args)), atol=0)


# -- subpixel nearest+conv formulation ----------------------------------------


@pytest.mark.parametrize("act", [None, "lrelu"])
def test_upsample_conv_subpixel_matches_ref(act):
    """conv3x3(nearest2x(x)) == the low-res phase-folded 2x2 formulation
    (ops/gn_conv.py:_ups_subpixel) — exact up to one fp32 weight-tap fold.

    Pinned at float32 matmul precision: this platform's default CPU conv
    runs reduced-precision (~2e-3 rel), which would mask a real phase bug.
    """
    g = np.random.default_rng(13)
    for (bsz, h, w_, cin, cout) in [(2, 8, 6, 64, 64), (1, 5, 7, 3, 16),
                                    (1, 4, 4, 180, 64)]:
        x = jnp.asarray(g.standard_normal((bsz, h, w_, cin)), jnp.float32)
        wk = jnp.asarray(g.standard_normal((3, 3, cin, cout)) * 0.1,
                         jnp.float32)
        bk = jnp.asarray(g.standard_normal(cout) * 0.1, jnp.float32)
        with jax.default_matmul_precision("float32"):
            ref = gn_conv._ups_ref(x, wk, bk, act)
            sub = gn_conv._ups_subpixel(x, wk, bk, act)
        assert sub.shape == (bsz, 2 * h, 2 * w_, cout)
        np.testing.assert_allclose(np.asarray(sub), np.asarray(ref),
                                   atol=2e-5)


def test_upsample_conv_subpixel_gate_and_grad(monkeypatch):
    """$EDTR_UPS_SUBPIX=1 routes the public API through the subpixel
    formulation; custom-vjp grads still match the reference math."""
    monkeypatch.setenv("EDTR_UPS_SUBPIX", "1")
    g = np.random.default_rng(14)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 32)), jnp.float32)
    wk = jnp.asarray(g.standard_normal((3, 3, 32, 64)) * 0.05, jnp.float32)
    bk = jnp.asarray(g.standard_normal(64) * 0.1, jnp.float32)
    with jax.default_matmul_precision("float32"):
        ref = gn_conv._ups_ref(x, wk, bk, "lrelu")
        got = gn_conv.upsample_conv(x, wk, bk, "lrelu")
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)
        gs = jax.grad(
            lambda *a: (gn_conv.upsample_conv(*a, "lrelu") ** 2).mean(),
            argnums=(0, 1, 2))(x, wk, bk)
        gr = jax.grad(
            lambda *a: (gn_conv._ups_ref(*a, "lrelu") ** 2).mean(),
            argnums=(0, 1, 2))(x, wk, bk)
    for a, r in zip(gs, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r), atol=1e-5)
