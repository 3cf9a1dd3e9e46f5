"""Full-chain EDTR restore golden: pipe.restore vs the composed torch chain.

VERDICT r4 next #9: per-module math was goldened (swinir/vae/unet/cldm/
sampler) but the INTEGRATION — scale_factor placement, *2-1 / (x+1)/2
ranges, q_sample@200, 4-step walk ordering, wavelet anchoring — was pinned
only against itself. This drives the exact eval graph of
``/root/reference/main/det/test_edtr.py:117-135``:

    pre = swinir(lq)
    z_pre = vae_encode(pre*2-1, mode) * scale        (model/cldm.py:107-135)
    z_T  = diffusion.q_sample(z_pre, 200, noise)
    z    = SpacedSampler.manual_sample_with_timesteps(4, [50,100,150,200])
    res  = wavelet_reconstruction((vae_decode(z)+1)/2, pre)

on BOTH sides with shared tiny weights (through utils/convert) and ZERO
stochastic noise (q_sample noise and the sampler's posterior noise are
zeroed on both sides — the noise-bearing math is goldened separately in
tests/test_diffusion.py::test_kstep_walk_matches_torch_spaced_sampler).
Our side runs the REAL public graph, ``EDTRPipeline.restore``.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import load_ref_module

pytestmark = pytest.mark.golden

# tiny dims mirroring __graft_entry__._flagship_pipeline(tiny=True)
UNET_TINY_TORCH = dict(
    image_size=8, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=[1], channel_mult=[1, 2],
    num_head_channels=16, use_spatial_transformer=True,
    use_linear_in_transformer=True, transformer_depth=1, context_dim=64,
    legacy=False,
)
UNET_CONV = dict(model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
                 attention_resolutions=(1,), transformer_depth=1,
                 use_linear_in_transformer=True)
DD = dict(double_z=True, z_channels=4, resolution=64, in_channels=3,
          out_ch=3, ch=32, ch_mult=[1, 2, 2, 2], num_res_blocks=1,
          attn_resolutions=[], dropout=0.0)
SWINIR_TORCH = dict(img_size=8, patch_size=1, in_chans=3, embed_dim=32,
                    depths=[2], num_heads=[2], window_size=4, mlp_ratio=2,
                    sf=8, img_range=1.0, upsampler="nearest+conv",
                    resi_connection="1conv", unshuffle=True,
                    unshuffle_scale=8)
SCALE = 0.18215


def _randomize(m, seed):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
    m.eval()
    return m


def test_fullchain_restore_matches_torch(monkeypatch):
    import torch

    from edtr_tpu.utils import convert as C
    import __graft_entry__ as G

    ref_swinir = load_ref_module("model.swinir")
    ref_vae = load_ref_module("model.vae")
    ref_cn = load_ref_module("model.controlnet")
    ref_gd = load_ref_module("model.gaussian_diffusion")
    ref_sampler = load_ref_module("utils.sampler")
    ref_common = load_ref_module("utils.common")

    t_sw = _randomize(ref_swinir.SwinIR(**SWINIR_TORCH), 0)
    t_vae = _randomize(ref_vae.AutoencoderKL(ddconfig=DD, embed_dim=4), 1)
    t_unet = _randomize(ref_cn.ControlledUnetModel(**UNET_TINY_TORCH), 2)
    t_cnet = _randomize(ref_cn.ControlNet(
        hint_channels=4,
        **{k: v for k, v in UNET_TINY_TORCH.items() if k != "out_channels"}), 3)
    t_diff = ref_gd.Diffusion(timesteps=1000, linear_start=0.00085,
                              linear_end=0.0120, beta_schedule="linear")

    g = np.random.default_rng(21)
    lq = g.random((1, 3, 64, 64)).astype(np.float32)
    c_txt = g.standard_normal((1, 77, 64)).astype(np.float32)
    used = [50, 100, 150, 200]

    # ---- torch oracle chain (main/det/test_edtr.py:117-135) ---------------
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))

    class CLDMLike:  # model/cldm.py:166-194, control_scales == 1
        def __call__(self, x, t, cond):
            control = t_cnet(x=x, hint=cond["c_img"], timesteps=t,
                             context=cond["c_txt"])
            return t_unet(x, timesteps=t, context=cond["c_txt"],
                          control=list(control))

    with torch.no_grad():
        pre_t = t_sw(torch.from_numpy(lq))
        post = t_vae.encode(pre_t * 2 - 1)
        z_pre_t = post.mode() * SCALE                 # model/cldm.py:107-135
        t200 = torch.tensor([200], dtype=torch.int64)
        z_T_t = t_diff.q_sample(z_pre_t, t200, torch.zeros_like(z_pre_t))
        sampler = ref_sampler.SpacedSampler(
            t_diff.betas.astype(np.float64))
        z_t = sampler.manual_sample_with_timesteps(
            CLDMLike(), "cpu", z_T_t, len(used), used, batch_size=1,
            cond={"c_txt": torch.from_numpy(c_txt), "c_img": z_pre_t},
            uncond=None, cfg_scale=1.0, progress=False)
        dec_t = t_vae.decode(z_t / SCALE)             # model/cldm.py:136-156
        res_t = ref_common.wavelet_reconstruction((dec_t + 1) / 2, pre_t)
    monkeypatch.undo()

    # ---- our side: the real public graph, shared weights ------------------
    pipe = G._flagship_pipeline(dtype=None, tiny=True)
    assert pipe.used_timesteps == used and pipe.start_timestep == 200
    params = {
        "swinir": C.convert_swinir(
            C.torch_state_dict_to_numpy(t_sw.state_dict()), depths=(2,)),
        "vae": C.convert_autoencoder_kl(
            C.torch_state_dict_to_numpy(t_vae.state_dict()),
            ch=32, ch_mult=(1, 2, 2, 2), num_res_blocks=1),
        "unet": C.convert_ldm_unet(
            C.torch_state_dict_to_numpy(t_unet.state_dict()), **UNET_CONV),
        "controlnet": C.convert_controlnet(
            C.torch_state_dict_to_numpy(t_cnet.state_dict()), **UNET_CONV),
    }
    # zero both stochastic draws (q_sample noise eager; sampler noise traced
    # into the scan as a constant zeros array)
    monkeypatch.setattr(
        jax.random, "normal",
        lambda key, shape=(), dtype=jnp.float32: jnp.zeros(shape, dtype))
    out = pipe.restore(params, jnp.asarray(lq.transpose(0, 2, 3, 1)),
                       jax.random.PRNGKey(0), c_txt=jnp.asarray(c_txt))
    monkeypatch.undo()

    np.testing.assert_allclose(
        np.asarray(out["pre_restored"]).transpose(0, 3, 1, 2),
        pre_t.numpy(), rtol=2e-3, atol=2e-3, err_msg="pre_restored")
    np.testing.assert_allclose(
        np.asarray(out["z"]).transpose(0, 3, 1, 2),
        z_t.numpy(), rtol=5e-3, atol=5e-3, err_msg="denoised latent")
    np.testing.assert_allclose(
        np.asarray(out["restored"]).transpose(0, 3, 1, 2),
        res_t.numpy(), rtol=1e-2, atol=1e-2, err_msg="restored image")
