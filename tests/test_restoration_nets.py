"""Smoke/shape tests for the secondary restoration nets (reference exports
model/__init__.py:13-15 — unused by configs, implemented for completeness)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

pytestmark = pytest.mark.golden  # torch-oracle tier


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


def test_rrdbnet_golden_vs_reference():
    """Full RRDBNet golden (sf=4 and the unshuffle x8 variant) vs the
    reference torch module through convert_rrdbnet."""
    import numpy as np
    import torch
    from ref_loader import load_ref_module
    from edtr_tpu.utils.convert import convert_rrdbnet
    from edtr_tpu.models.bsrnet import RRDBNet

    ref_mod = load_ref_module("model.bsrnet")

    for unshuffle, sf, in_size in ((False, 4, 16), (True, 8, 32)):
        m = ref_mod.RRDBNet(
            in_nc=3, out_nc=3, nf=32, nb=2, gc=16,
            sf=sf if not unshuffle else 4,
            unshuffle=unshuffle, unshuffle_scale=8 if unshuffle else None,
        )
        g = torch.Generator().manual_seed(3)
        with torch.no_grad():
            for p in m.parameters():
                p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        m.eval()

        x = torch.rand(1, 3, in_size, in_size, generator=g)
        with torch.no_grad():
            ref_out = m(x).numpy()

        net = RRDBNet(
            in_nc=3, out_nc=3, nf=32, nb=2, gc=16,
            sf=4 if unshuffle else sf,
            unshuffle=unshuffle, unshuffle_scale=8 if unshuffle else None,
        )
        params = convert_rrdbnet(m.state_dict())
        ours = net.apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_out, rtol=3e-3, atol=3e-3
        )


def test_edsr_golden_vs_reference():
    import numpy as np
    import torch
    from ref_loader import load_ref_module
    from edtr_tpu.utils.convert import convert_edsr
    from edtr_tpu.models.edsr import EDSR

    ref_mod = load_ref_module("model.edsr")

    for unshuffle in (False, True):
        m = ref_mod.EDSR(
            n_resblocks=2, n_feats=16, scale=4, res_scale=0.1,
            unshuffle=unshuffle, unshuffle_scale=8 if unshuffle else None,
        )
        g = torch.Generator().manual_seed(5)
        with torch.no_grad():
            for n, p in m.named_parameters():
                if "mean" not in n:
                    p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        m.eval()

        in_size = 32 if unshuffle else 12
        x = torch.rand(1, 3, in_size, in_size, generator=g)
        with torch.no_grad():
            ref_out = m(x).numpy()

        net = EDSR(n_resblocks=2, n_feats=16, scale=4, res_scale=0.1,
                   unshuffle=unshuffle, unshuffle_scale=8 if unshuffle else None)
        params = convert_edsr(m.state_dict(), n_resblocks=2, unshuffle=unshuffle)
        ours = net.apply({"params": params},
                         jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref_out, rtol=3e-3, atol=3e-3
        )


def test_scunet_golden_vs_reference():
    import numpy as np
    import torch
    from ref_loader import load_ref_module
    from edtr_tpu.utils.convert import convert_scunet
    from edtr_tpu.models.scunet import SCUNet

    ref_mod = load_ref_module("model.scunet")

    _scunet_case(ref_mod, [1] * 7)   # W blocks only
    _scunet_case(ref_mod, [2] * 7)   # W + shifted (SW) blocks


def _scunet_case(ref_mod, config):
    import numpy as np
    import torch
    from edtr_tpu.utils.convert import convert_scunet
    from edtr_tpu.models.scunet import SCUNet

    m = ref_mod.SCUNet(in_nc=3, config=list(config), dim=64, input_resolution=64)
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    m.eval()

    x = torch.rand(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        ref_out = m(x).numpy()

    net = SCUNet(in_nc=3, config=tuple(config), dim=64)
    params = convert_scunet(m.state_dict())
    ours = net.apply({"params": params},
                     jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref_out, rtol=3e-3, atol=3e-3
    )


def test_skunet_golden_vs_reference():
    import numpy as np
    import torch
    from ref_loader import load_ref_module
    from edtr_tpu.utils.convert import convert_skunet
    from edtr_tpu.models.skunet import SKUNet

    ref_mod = load_ref_module("model.skunet")
    m = ref_mod.SKUNet()
    g = torch.Generator().manual_seed(13)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for name, b in m.named_buffers():
            if name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
            elif name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) * 0.5 + 0.5)
    m.eval()

    x = torch.rand(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        ref_out = m(x).numpy()

    net = SKUNet()
    variables = convert_skunet(m.state_dict())
    ours = net.apply(variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref_out, rtol=3e-3, atol=3e-3
    )
