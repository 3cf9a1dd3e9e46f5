"""Measured per-shape kernel dispatch (edtr_tpu/ops/dispatch.py).

VERDICT r3: kernels must be default-on only where measured to win; env
kill-switch / force modes drive the A/B harness; >1-device meshes disable
every whole-array Pallas family (weak #8)."""

import json

import pytest

from edtr_tpu.ops import dispatch


@pytest.fixture(autouse=True)
def _reset_multichip():
    prev = dispatch.multichip_active()
    dispatch.set_multichip(False)
    yield
    dispatch.set_multichip(prev)


def test_builtin_table_measured_entries():
    # r4 e2e A/B gate (results/chip_queue/ab_e2e.json): standalone winners
    # that regress their stage ship OFF; only swin_block holds its win e2e.
    assert not dispatch.decide("geglu", "4096x320->1280", 4096, 320, 1280)
    assert not dispatch.decide("geglu", "1024x640->2560", 1024, 640, 2560)
    assert not dispatch.decide("geglu", "256x1280->5120", 256, 1280, 5120)
    # 1.47-3.32x standalone at K=3 but the scan stage is faster with them
    # off (no_lnmm 38.08 vs table 38.39 ms/img)
    assert not dispatch.decide("ln_matmul", "4096x320->320x3",
                               4096, 320, 320, 3)
    assert not dispatch.decide("ln_matmul", "256x1280->1280x3",
                               256, 1280, 1280, 3)
    assert not dispatch.decide("affine_matmul", "1024x640->640",
                               1024, 640, 640)
    # 1.38-1.87x standalone but vae_encode 7.56->9.26 / decode 16.57->20.50
    # ms/img with them on
    assert not dispatch.decide("gn_conv", "64x64x640->320", 64, 64, 640, 320)
    assert not dispatch.decide("gn_conv", "32x32x640->640", 32, 32, 640, 640)
    assert not dispatch.decide("gn_conv", "8x8x1280->1280", 8, 8, 1280, 1280)
    assert not dispatch.decide("gn_conv", "512x512x256->128",
                               512, 512, 256, 128)
    assert not dispatch.decide("ups_conv", "512x512x256->256",
                               512, 512, 256, 256)
    # the r4 0.5%@10-iter swin win reversed at 50 iters: off 9.65 vs
    # table 10.20 ms/img (ab_e2e_swinir_i50.json) -> off
    assert not dispatch.decide("swin_block", "64x64x180", 64, 64, 180)


def test_unknown_shape_uses_family_rule():
    # every family whose measured shapes failed the e2e gate is off for
    # unmeasured shapes too (swin_block joined them in round 5)
    assert not dispatch.decide("geglu", "512x999->3996", 512, 999, 3996)
    assert not dispatch.decide("geglu", "512x1280->5120x9", 512, 1280, 5120)
    assert not dispatch.decide("gn_conv", "96x96x384->384", 96, 96, 384, 384)
    assert not dispatch.decide("gn_conv", "24x24x384->384", 24, 24, 384, 384)
    assert not dispatch.decide("ln_matmul", "4096x999->999x1",
                               4096, 999, 999, 1)
    assert not dispatch.decide("swin_block", "48x48x180", 48, 48, 180)


def test_env_modes(monkeypatch):
    key, dims = "64x64x640->320", (64, 64, 640, 320)
    monkeypatch.setenv("EDTR_GNCONV_FUSED", "0")
    assert not dispatch.decide("gn_conv", key, *dims)
    monkeypatch.setenv("EDTR_GNCONV_FUSED", "force")
    assert dispatch.decide("gn_conv", "8x8x1280->1280", 8, 8, 1280, 1280)
    monkeypatch.setenv("EDTR_GNCONV_FUSED", "1")
    assert not dispatch.decide("gn_conv", "8x8x1280->1280", 8, 8, 1280, 1280)


def test_table_override_file(tmp_path, monkeypatch):
    p = tmp_path / "table.json"
    p.write_text(json.dumps({
        "gn_conv": {"64x64x640->320": True, "77x77x128->128": True},
        "swin_block": {"64x64x180": True}}))
    monkeypatch.setenv("EDTR_KERNEL_TABLE", str(p))
    # override wins over the built-in entry (both directions)...
    assert dispatch.decide("gn_conv", "64x64x640->320", 64, 64, 640, 320)
    assert dispatch.decide("gn_conv", "77x77x128->128", 77, 77, 128, 128)
    assert dispatch.decide("swin_block", "64x64x180", 64, 64, 180)
    # ...and untouched built-ins persist (merge, not replace)
    assert not dispatch.decide("gn_conv", "512x512x256->128",
                               512, 512, 256, 128)
    monkeypatch.delenv("EDTR_KERNEL_TABLE")
    assert not dispatch.decide("gn_conv", "64x64x640->320", 64, 64, 640, 320)
    assert not dispatch.decide("swin_block", "64x64x180", 64, 64, 180)


def test_multichip_disables_every_family(monkeypatch):
    dispatch.set_multichip(True)
    assert not dispatch.decide("gn_conv", "64x64x640->320", 64, 64, 640, 320)
    monkeypatch.setenv("EDTR_GNCONV_FUSED", "force")
    assert not dispatch.decide("gn_conv", "64x64x640->320", 64, 64, 640, 320)
    dispatch.set_multichip(False)
    assert dispatch.decide("gn_conv", "64x64x640->320", 64, 64, 640, 320)


def test_make_mesh_flips_multichip():
    import jax

    from edtr_tpu.parallel.mesh import make_mesh

    devices = jax.devices("cpu")
    assert len(devices) >= 2
    dispatch.set_multichip(False)
    make_mesh(1, 1, devices=devices[:1])
    assert not dispatch.multichip_active()
    make_mesh(2, 1, devices=devices[:2])
    assert dispatch.multichip_active()


def test_force_kernel_hook_bypasses_multichip(monkeypatch):
    """CPU interpret-mode kernel tests stay meaningful regardless of
    whether an earlier test built a multi-device mesh."""
    import jax.numpy as jnp
    import numpy as np

    from edtr_tpu.ops import gn_conv

    dispatch.set_multichip(True)
    monkeypatch.setattr(gn_conv, "_FORCE_KERNEL", True)
    assert gn_conv.will_fuse(32, 32, 64, 64)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 32, 32, 64)), jnp.float32)
    mul = jnp.asarray(rng.standard_normal((1, 64)) * 0.3 + 1, jnp.float32)
    add = jnp.asarray(rng.standard_normal((1, 64)) * 0.1, jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) * 0.02, jnp.float32)
    b = jnp.asarray(rng.standard_normal(64) * 0.05, jnp.float32)
    got = gn_conv.gn_silu_conv(x, mul, add, w, b, None, None)
    ref = gn_conv._ref(x, mul, add, w, b, None, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_ops_will_fuse_cpu_is_off():
    """Without the force hook, CPU never takes a Pallas path."""
    from edtr_tpu.ops import geglu, gn_conv, ln_matmul, swin_block

    assert not geglu.will_fuse(256, 1280, 5120)
    assert not ln_matmul._will_fuse_ln(4096, 320, 320, 3)
    assert not ln_matmul._will_fuse_affine(256, 1280, 1280)
    assert not gn_conv.will_fuse(64, 64, 640, 320)
    assert not gn_conv.will_fuse_ups(512, 512, 256, 256)
    assert not swin_block.will_fuse(64, 64, 8, 180)
