"""Golden parity: edtr_tpu SwinIR vs the reference torch SwinIR.

Uses the EDTR configuration shape (unshuffle + nearest+conv, sf=8) at tiny
dims, plus a shifted-window case that exercises the attention mask.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edtr_tpu.models.swinir import SwinIR, pixel_unshuffle, window_partition, window_reverse
from edtr_tpu.utils import convert as C

from ref_loader import load_ref_module

pytestmark = pytest.mark.golden  # torch-oracle tier

TINY = dict(
    img_size=8,
    patch_size=1,
    in_chans=3,
    embed_dim=24,
    depths=[2, 2],
    num_heads=[3, 3],
    window_size=4,
    mlp_ratio=2,
    sf=8,
    img_range=1.0,
    upsampler="nearest+conv",
    resi_connection="1conv",
    unshuffle=True,
    unshuffle_scale=8,
)


@pytest.fixture(scope="module")
def torch_swinir():
    import torch

    ref = load_ref_module("model.swinir")
    m = ref.SwinIR(**TINY)
    m.eval()
    g = torch.Generator().manual_seed(3)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    return m


def test_swinir_forward_parity(torch_swinir):
    import torch

    g = np.random.default_rng(0)
    # 64x64 input -> unshuffle(8) -> 8x8 internal, window 4 -> shifted blocks active
    x = g.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = torch_swinir(torch.from_numpy(x)).numpy()

    sd = C.torch_state_dict_to_numpy(torch_swinir.state_dict())
    params = C.convert_swinir(sd, depths=(2, 2), unshuffle=True, sf=8)
    ours = SwinIR(**{**TINY, "depths": tuple(TINY["depths"]),
                     "num_heads": tuple(TINY["num_heads"])}).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=5e-3, atol=5e-3
    )


def test_pixel_unshuffle_matches_torch():
    import torch

    g = np.random.default_rng(1)
    x = g.standard_normal((2, 3, 8, 8)).astype(np.float32)
    ref = torch.nn.functional.pixel_unshuffle(torch.from_numpy(x), 2).numpy()
    ours = pixel_unshuffle(jnp.asarray(x.transpose(0, 2, 3, 1)), 2)
    np.testing.assert_array_equal(np.asarray(ours).transpose(0, 3, 1, 2), ref)


def test_window_partition_roundtrip():
    g = np.random.default_rng(2)
    x = jnp.asarray(g.standard_normal((2, 8, 12, 5)), jnp.float32)
    w = window_partition(x, 4)
    assert w.shape == (2 * 2 * 3, 16, 5)
    back = window_reverse(w, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_lane_padded_swinir_is_exact(torch_swinir):
    """lane_pad (VERDICT r4 #2: 180->192 MXU alignment at convert time) must
    be a pure relayout: the padded module on pad_swinir_lanes params equals
    the unpadded module bit-for-bit-closely AND the torch oracle.

    TINY dims: embed 24, 3 heads (d 8) padded by 6 -> 30 (d 10) — exercises
    the per-head qkv/proj remap, masked LN stats and the kept softmax scale.
    """
    import torch

    g = np.random.default_rng(4)
    x = g.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = torch_swinir(torch.from_numpy(x)).numpy()

    sd = C.torch_state_dict_to_numpy(torch_swinir.state_dict())
    params = C.convert_swinir(sd, depths=(2, 2), unshuffle=True, sf=8)
    cfg = {**TINY, "depths": tuple(TINY["depths"]),
           "num_heads": tuple(TINY["num_heads"])}
    base = SwinIR(**cfg).apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))

    padded_params = C.pad_swinir_lanes(params, lane_pad=6, heads=3)
    padded = SwinIR(**cfg, lane_pad=6).apply(
        {"params": jax.tree.map(jnp.asarray, padded_params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)))

    np.testing.assert_allclose(np.asarray(padded), np.asarray(base),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(padded).transpose(0, 3, 1, 2), ref, rtol=5e-3, atol=5e-3)
