"""Golden parity: edtr_tpu KL-VAE vs the reference torch AutoencoderKL."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edtr_tpu.models.vae import AutoencoderKL
from edtr_tpu.utils import convert as C

from ref_loader import load_ref_module

pytestmark = pytest.mark.golden  # torch-oracle tier

DD_TINY = dict(
    double_z=True,
    z_channels=3,
    resolution=32,
    in_channels=3,
    out_ch=3,
    ch=32,
    ch_mult=[1, 2],
    num_res_blocks=2,
    attn_resolutions=[],
    dropout=0.0,
)


@pytest.fixture(scope="module")
def torch_vae():
    import torch

    ref_vae = load_ref_module("model.vae")
    m = ref_vae.AutoencoderKL(ddconfig=DD_TINY, embed_dim=3)
    m.eval()
    g = torch.Generator().manual_seed(7)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.08)
    return m


def _our_vae():
    return AutoencoderKL(ddconfig=DD_TINY, embed_dim=3)


def _convert(m):
    sd = C.torch_state_dict_to_numpy(m.state_dict())
    return C.convert_autoencoder_kl(sd, ch=32, ch_mult=(1, 2), num_res_blocks=2)


def test_vae_encode_parity(torch_vae):
    import torch

    g = np.random.default_rng(0)
    x = g.standard_normal((1, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        post = torch_vae.encode(torch.from_numpy(x))
        ref_mean, ref_logvar = post.mean.numpy(), post.logvar.numpy()

    params = _convert(torch_vae)
    vae = _our_vae()
    posterior = vae.apply(
        {"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)), method=vae.encode
    )
    np.testing.assert_allclose(
        np.asarray(posterior.mean).transpose(0, 3, 1, 2), ref_mean, rtol=3e-3, atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(posterior.logvar).transpose(0, 3, 1, 2), ref_logvar, rtol=3e-3, atol=3e-3
    )


def test_vae_decode_parity(torch_vae):
    import torch

    g = np.random.default_rng(1)
    z = g.standard_normal((1, 3, 8, 8)).astype(np.float32)
    with torch.no_grad():
        ref = torch_vae.decode(torch.from_numpy(z)).numpy()

    params = _convert(torch_vae)
    vae = _our_vae()
    ours = vae.apply(
        {"params": params}, jnp.asarray(z.transpose(0, 2, 3, 1)), method=vae.decode
    )
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref, rtol=3e-3, atol=3e-3
    )


def test_diagonal_gaussian_stats():
    from edtr_tpu.models.distributions import DiagonalGaussianDistribution

    g = np.random.default_rng(2)
    moments = jnp.asarray(g.standard_normal((2, 4, 4, 8)), jnp.float32)
    d = DiagonalGaussianDistribution(moments)
    assert d.mode().shape == (2, 4, 4, 4)
    kl = d.kl()
    assert kl.shape == (2,)
    # sampling respects mean/std statistically
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    samples = jax.vmap(d.sample)(keys)
    emp_mean = np.asarray(samples.mean(axis=0))
    np.testing.assert_allclose(emp_mean, np.asarray(d.mean), atol=0.15)
