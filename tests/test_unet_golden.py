"""Golden parity: edtr_tpu UNet/ControlNet vs reference torch modules.

Random-initialized tiny configs; torch state dict converted with
edtr_tpu.utils.convert and outputs compared in fp32.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edtr_tpu.models.unet import UNetModel
from edtr_tpu.models.controlnet import ControlNet
from edtr_tpu.utils import convert as C

from ref_loader import load_ref_module

pytestmark = pytest.mark.golden  # torch-oracle tier

TINY = dict(
    image_size=8,
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=2,
    attention_resolutions=[2, 1],
    channel_mult=[1, 2],
    num_head_channels=16,
    use_spatial_transformer=True,
    use_linear_in_transformer=True,
    transformer_depth=1,
    context_dim=48,
    legacy=False,
)

OUR_TINY = dict(
    in_channels=4,
    model_channels=32,
    out_channels=4,
    num_res_blocks=2,
    attention_resolutions=(2, 1),
    channel_mult=(1, 2),
    num_head_channels=16,
    transformer_depth=1,
    context_dim=48,
    use_linear_in_transformer=True,
)

CONV_TINY = dict(
    model_channels=32,
    num_res_blocks=2,
    channel_mult=(1, 2),
    attention_resolutions=(2, 1),
    transformer_depth=1,
    use_linear_in_transformer=True,
)


def _randomize(module, seed=0):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return module


@pytest.fixture(scope="module")
def torch_unet():
    import torch

    ref_unet = load_ref_module("model.unet")
    m = ref_unet.UNetModel(**TINY)
    m.eval()
    return _randomize(m)


def test_unet_forward_parity(torch_unet):
    import torch

    g = np.random.default_rng(0)
    x = g.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([200, 31], dtype=np.int64)
    ctx = g.standard_normal((2, 7, 48)).astype(np.float32)

    with torch.no_grad():
        ref = torch_unet(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx),
        ).numpy()

    sd = C.torch_state_dict_to_numpy(torch_unet.state_dict())
    params = C.convert_ldm_unet(sd, **CONV_TINY)
    ours = UNetModel(**OUR_TINY).apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx),
    )
    ours_nchw = np.asarray(ours).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(ours_nchw, ref, rtol=3e-3, atol=3e-3)


def test_controlled_unet_with_control_parity(torch_unet):
    import torch

    ref_cn = load_ref_module("model.controlnet")
    tiny_cn = {k: v for k, v in TINY.items() if k != "out_channels"}
    cn = ref_cn.ControlNet(hint_channels=4, **tiny_cn)
    cn.eval()
    _randomize(cn, seed=1)

    # ControlledUnetModel shares weights with UNetModel; re-wrap
    cunet = ref_cn.ControlledUnetModel(**TINY)
    cunet.load_state_dict(torch_unet.state_dict())
    cunet.eval()

    g = np.random.default_rng(1)
    x = g.standard_normal((1, 4, 8, 8)).astype(np.float32)
    hint = g.standard_normal((1, 4, 8, 8)).astype(np.float32)
    t = np.array([100], dtype=np.int64)
    ctx = g.standard_normal((1, 7, 48)).astype(np.float32)

    with torch.no_grad():
        control_ref = cn(
            x=torch.from_numpy(x), hint=torch.from_numpy(hint),
            timesteps=torch.from_numpy(t), context=torch.from_numpy(ctx),
        )
        ref = cunet(
            torch.from_numpy(x), timesteps=torch.from_numpy(t),
            context=torch.from_numpy(ctx), control=list(control_ref),
        ).numpy()

    cn_sd = C.torch_state_dict_to_numpy(cn.state_dict())
    cn_params = C.convert_controlnet(cn_sd, **CONV_TINY)
    our_tiny_cn = {k: v for k, v in OUR_TINY.items() if k != "out_channels"}
    our_cn = ControlNet(hint_channels=4, **our_tiny_cn)
    control = our_cn.apply(
        {"params": cn_params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(hint.transpose(0, 2, 3, 1)),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx),
    )
    assert len(control) == len(control_ref)
    for ours_c, ref_c in zip(control, control_ref):
        np.testing.assert_allclose(
            np.asarray(ours_c).transpose(0, 3, 1, 2), ref_c.numpy(),
            rtol=3e-3, atol=3e-3,
        )

    sd = C.torch_state_dict_to_numpy(torch_unet.state_dict())
    params = C.convert_ldm_unet(sd, **CONV_TINY)
    ours = UNetModel(**OUR_TINY).apply(
        {"params": params},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
        jnp.asarray(t, jnp.int32),
        jnp.asarray(ctx),
        control=control,
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=3e-3, atol=3e-3
    )


def test_controlnet_from_unet_surgery(torch_unet):
    """Zero-pad init must make ControlNet(x, hint) == UNet-encoder taps at 0."""
    sd = C.torch_state_dict_to_numpy(torch_unet.state_dict())
    unet_params = C.convert_ldm_unet(sd, **CONV_TINY)
    cn_params = C.controlnet_from_unet(unet_params, hint_channels=4)

    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((1, 8, 8, 4)), jnp.float32)
    hint = jnp.asarray(g.standard_normal((1, 8, 8, 4)), jnp.float32)
    t = jnp.array([50], jnp.int32)
    ctx = jnp.asarray(g.standard_normal((1, 7, 48)), jnp.float32)

    our_cn = ControlNet(
        hint_channels=4, **{k: v for k, v in OUR_TINY.items() if k != "out_channels"}
    )
    control = our_cn.apply({"params": cn_params}, x, hint, t, ctx)
    # all zero_conv outputs must be exactly zero at init
    for c in control:
        assert float(jnp.abs(c).max()) == 0.0

    # and the hint must not influence the zero-padded first conv
    control2 = our_cn.apply({"params": cn_params}, x, hint * 100.0, t, ctx)
    for c1, c2 in zip(control, control2):
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
