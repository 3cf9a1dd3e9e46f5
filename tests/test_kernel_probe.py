"""Fail-safe kernel probe (ops/kernel_probe.py): numeric-mismatch detection
helpers and the CPU no-op / kill-switch status contract."""

import jax.numpy as jnp
import numpy as np
import pytest

from edtr_tpu.ops import kernel_probe


def test_mismatch_zero_on_equal_trees():
    a = (jnp.ones((4, 8), jnp.bfloat16), jnp.arange(6.0).reshape(2, 3))
    assert kernel_probe._mismatch(a, a) == 0.0


def test_mismatch_is_relative_to_ref_scale():
    ref = jnp.full((8,), 100.0)
    off = ref + 5.0
    err = kernel_probe._mismatch(off, ref)
    np.testing.assert_allclose(err, 0.05, rtol=1e-5)


def test_check_raises_on_numeric_mismatch():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 8)),
                    jnp.float32)
    with pytest.raises(ValueError, match="numeric mismatch"):
        kernel_probe._check(lambda v: v * 1.5, lambda v: v, (x,))
    # identical fns pass
    kernel_probe._check(lambda v: v + 1.0, lambda v: v + 1.0, (x,))


def test_probe_is_noop_on_cpu_and_honors_killswitch(monkeypatch):
    monkeypatch.setenv("EDTR_GEGLU_FUSED", "0")
    status = kernel_probe.ensure_fused_kernels_usable()
    assert status["geglu"] is False
    # round 5: swin_block joined the off-by-default families (the 50-iter
    # e2e re-measure reversed its r4 win; ab_e2e_swinir_i50.json)
    assert status["swin_block"] is False
    assert "gn_conv_band" in status
