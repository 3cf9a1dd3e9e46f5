"""Smoke/shape tests for the secondary restoration nets (reference exports
model/__init__.py:13-15 — unused by configs, implemented for completeness)."""

import jax
import jax.numpy as jnp
import numpy as np


def test_rrdbnet_sr4():
    from edtr_tpu.models.bsrnet import RRDBNet

    net = RRDBNet(nf=16, nb=2, gc=8, sf=4)
    x = jnp.zeros((1, 16, 16, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == (1, 64, 64, 3)


def test_scunet_same_resolution():
    from edtr_tpu.models.scunet import SCUNet

    net = SCUNet(dim=64, config=(1, 1, 1, 1, 1, 1, 1), input_resolution=64)
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_skunet_residual_output():
    from edtr_tpu.models.skunet import SKUNet

    net = SKUNet()
    x = jax.random.uniform(jax.random.PRNGKey(2), (1, 32, 32, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x, normalize=True)
    assert y.shape == x.shape


def test_edsr_sr2():
    from edtr_tpu.models.edsr import EDSR

    net = EDSR(n_resblocks=2, n_feats=16, scale=2)
    x = jnp.zeros((1, 8, 8, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == (1, 16, 16, 3)


def test_swinir_pixelshuffle_branch():
    from edtr_tpu.models.swinir import SwinIR

    net = SwinIR(embed_dim=16, depths=(1,), num_heads=(2,), window_size=4,
                 mlp_ratio=2, sf=2, upsampler="pixelshuffle", unshuffle=False)
    x = jnp.zeros((1, 16, 16, 3))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), x)
    y = net.apply(v, x)
    assert y.shape == (1, 32, 32, 3)
