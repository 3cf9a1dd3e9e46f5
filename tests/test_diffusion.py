"""Diffusion schedule + spaced sampler math tests.

Golden strategy (SURVEY.md §4): closed-form identities + parity against the
reference's torch implementation of `model/gaussian_diffusion.py` (imported
straight from /root/reference, which only needs numpy+torch).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edtr_tpu.diffusion.schedule import (
    Diffusion,
    extract,
    make_beta_schedule,
    space_timesteps,
)
from edtr_tpu.diffusion.sampler import (
    SpacedSampler,
    make_spaced_schedule,
    p_sample,
    sample_scan,
)

REF = "/root/reference"


def _ref_diffusion():
    # Load the reference module straight from its file to avoid the heavy
    # model/__init__.py import chain (torchvision isn't installed here).
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_gaussian_diffusion", f"{REF}/model/gaussian_diffusion.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    TorchDiffusion = mod.Diffusion

    return TorchDiffusion(
        timesteps=1000, linear_start=0.00085, linear_end=0.0120, beta_schedule="linear"
    )


def test_beta_schedule_linear_matches_reference_tables():
    ref = _ref_diffusion()
    ours = Diffusion.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    np.testing.assert_allclose(
        np.asarray(ours.betas), ref.betas.astype(np.float32), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(ours.sqrt_alphas_cumprod),
        ref.sqrt_alphas_cumprod.numpy(),
        rtol=0,
        atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(ours.sqrt_recipm1_alphas_cumprod),
        ref.sqrt_recipm1_alphas_cumprod.numpy(),
        rtol=0,
        atol=1e-6,
    )


def test_q_sample_and_xstart_roundtrip_match_reference(rng):
    import torch

    ref = _ref_diffusion()
    ours = Diffusion.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    x0 = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    noise = rng.standard_normal((2, 4, 8, 8)).astype(np.float32)
    t = np.array([200, 50], dtype=np.int64)

    ref_xt = ref.q_sample(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(noise))
    our_xt = ours.q_sample(jnp.asarray(x0), jnp.asarray(t, jnp.int32), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(our_xt), ref_xt.numpy(), rtol=1e-6, atol=1e-6)

    # eps-parameterized x0 recovery must invert q_sample exactly
    x0_rec = ours.predict_xstart_from_eps(our_xt, jnp.asarray(t, jnp.int32), jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(x0_rec), x0, rtol=1e-4, atol=1e-4)


def test_get_v_matches_reference(rng):
    import torch

    ref = _ref_diffusion()
    ours = Diffusion.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    x = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    noise = rng.standard_normal((2, 4, 4, 4)).astype(np.float32)
    t = np.array([0, 999], dtype=np.int64)
    ref_v = ref.get_v(torch.from_numpy(x), torch.from_numpy(noise), torch.from_numpy(t))
    our_v = ours.get_v(jnp.asarray(x), jnp.asarray(noise), jnp.asarray(t, jnp.int32))
    np.testing.assert_allclose(np.asarray(our_v), ref_v.numpy(), rtol=1e-6, atol=1e-6)


def test_space_timesteps_known_values():
    # EDTR-s4 schedule: start_timestep=200, 4 steps -> [50, 100, 150, 200]
    # is passed manually; the generic spacing must reproduce IDDPM behavior.
    assert space_timesteps(1000, "1") == {0}
    got = sorted(space_timesteps(1000, "4"))
    assert len(got) == 4 and got[0] == 0 and got[-1] == 999
    assert sorted(space_timesteps(10, "10")) == list(range(10))
    assert sorted(space_timesteps(1000, "ddim50")) == list(range(0, 1000, 20))


def test_spaced_schedule_marginal_consistency():
    """Spaced alphas_cumprod must equal the original at the kept timesteps.

    This is the defining property of IDDPM respacing (utils/sampler.py:94-96).
    """
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    used = [50, 100, 150, 200]
    sched = make_spaced_schedule(betas, 4, used)
    orig_ac = np.cumprod(1.0 - betas)
    # sqrt_recip_alphas_cumprod[i] == sqrt(1/orig_ac[timesteps[i]])
    for i, ts in enumerate(used):
        np.testing.assert_allclose(
            float(sched.sqrt_recip_alphas_cumprod[i]),
            np.sqrt(1.0 / orig_ac[ts]),
            rtol=1e-6,
        )
        np.testing.assert_allclose(
            float(sched.sqrt_recipm1_alphas_cumprod[i]),
            np.sqrt(1.0 / orig_ac[ts] - 1.0),
            rtol=1e-6,
        )


def test_single_step_sampler_returns_pred_x0():
    """With one step, posterior coef1==1, coef2==0, and index==0 masks the
    noise, so x_prev must equal the model's x0 estimate exactly."""
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = make_spaced_schedule(betas, 1, [200])
    np.testing.assert_allclose(float(sched.posterior_mean_coef1[0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(sched.posterior_mean_coef2[0]), 0.0, atol=1e-12)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 8, 4)), jnp.float32)
    eps_value = 0.3 * jnp.ones_like(x)
    model_fn = lambda xt, t, cond: eps_value
    x_prev, pred_x0 = p_sample(
        model_fn, sched, x,
        jnp.array([200], jnp.int32), jnp.array([0], jnp.int32), {},
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(pred_x0), rtol=1e-6)
    expected = sched.predict_xstart_from_eps(x, jnp.array([0], jnp.int32), eps_value)
    np.testing.assert_allclose(np.asarray(pred_x0), np.asarray(expected), rtol=1e-6)


def test_sample_scan_matches_python_loop():
    """The lax.scan compilation must be step-for-step identical to an eager
    Python loop over p_sample with the same keys."""
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    used = [50, 100, 150, 200]
    sched = make_spaced_schedule(betas, 4, used)
    model_fn = lambda x, t, cond: 0.1 * x + cond["c"]

    x_T = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 8, 4)), jnp.float32
    )
    cond = {"c": jnp.full((1, 1, 1, 4), 0.05, jnp.float32)}
    rng = jax.random.PRNGKey(42)

    out_scan = jax.jit(
        lambda xT, key: sample_scan(model_fn, sched, xT, cond, key)
    )(x_T, rng)

    # eager replay
    x = x_T
    key = rng
    n = sched.num_steps
    for i, ts in enumerate(np.flip(np.asarray(sched.timesteps))):
        key, sub = jax.random.split(key)
        t = jnp.full((2,), int(ts), jnp.int32)
        index = jnp.full((2,), n - 1 - i, jnp.int32)
        x, _ = p_sample(model_fn, sched, x, t, index, cond, sub)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x), rtol=1e-5, atol=1e-5)


def test_sampler_class_caches_schedules():
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    s = SpacedSampler(betas)
    a = s.make_schedule(4, [50, 100, 150, 200])
    b = s.make_schedule(4, [50, 100, 150, 200])
    assert a is b


def test_reverse_one_step_denoise():
    """EDTR `reverse`: with the true eps as model output, x_pred == x0."""
    ours = Diffusion.create(timesteps=1000, linear_start=0.00085, linear_end=0.0120)
    g = np.random.default_rng(3)
    x0 = jnp.asarray(g.standard_normal((2, 8, 8, 4)), jnp.float32)
    noise = jnp.asarray(g.standard_normal((2, 8, 8, 4)), jnp.float32)
    t = jnp.array([200, 200], jnp.int32)
    out = ours.reverse(lambda xt, tt, c: noise, t, x0, cond={}, noise=noise)
    np.testing.assert_allclose(np.asarray(out["x_pred"]), np.asarray(x0), rtol=1e-4, atol=1e-4)


def test_extract_broadcast_shape():
    table = jnp.arange(10.0)
    t = jnp.array([1, 2, 3], jnp.int32)
    out = extract(table, t, 4)
    assert out.shape == (3, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(out).ravel(), [1.0, 2.0, 3.0])


def test_sample_scan_unroll_invariant(monkeypatch):
    """unroll is a scheduling knob only: fully unrolled, partially unrolled,
    env-selected, and rolled scans must agree bitwise-closely (same rng
    path; lax.scan semantics are unroll-independent)."""
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    sched = make_spaced_schedule(betas, 4, [50, 100, 150, 200])
    model_fn = lambda x, t, cond: 0.1 * x + cond["c"]
    x_T = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 8, 4)), jnp.float32
    )
    cond = {"c": jnp.full((1, 1, 1, 4), 0.05, jnp.float32)}
    rng = jax.random.PRNGKey(7)

    outs = [
        jax.jit(lambda xT, key, u=u: sample_scan(
            model_fn, sched, xT, cond, key, unroll=u))(x_T, rng)
        for u in (1, 2, 4)
    ]
    monkeypatch.setenv("EDTR_SCAN_UNROLL", "4")
    outs.append(jax.jit(lambda xT, key: sample_scan(
        model_fn, sched, xT, cond, key))(x_T, rng))
    for o in outs[1:]:
        np.testing.assert_allclose(np.asarray(o), np.asarray(outs[0]),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.golden
def test_kstep_walk_matches_torch_spaced_sampler(monkeypatch):
    """4-step EDTR walk golden vs the torch ``SpacedSampler`` (VERDICT r4
    missing #3): the spaced-posterior reconstruction + K-step chain itself,
    not just the one-step math.

    Both sides drive the SAME tiny ControlNet+UNet (weights shared through
    ``utils/convert``) from the same ``x_T`` with the same injected per-step
    noise; oracle is ``manual_sample_with_timesteps``
    (/root/reference/utils/sampler.py:267-323 -> :184-204 -> :85-133) around
    ``model/cldm.py:166-194``'s forward (control_scales all 1).
    """
    import torch

    from ref_loader import load_ref_module
    from edtr_tpu.models.controlnet import ControlNet
    from edtr_tpu.models.unet import UNetModel
    from edtr_tpu.utils import convert as C
    from test_unet_golden import CONV_TINY, OUR_TINY, TINY, _randomize

    ref_cn_mod = load_ref_module("model.controlnet")
    ref_sampler_mod = load_ref_module("utils.sampler")

    tiny_cn = {k: v for k, v in TINY.items() if k != "out_channels"}
    t_unet = ref_cn_mod.ControlledUnetModel(**TINY)
    _randomize(t_unet, seed=0)
    t_unet.eval()
    t_cn = ref_cn_mod.ControlNet(hint_channels=4, **tiny_cn)
    _randomize(t_cn, seed=1)
    t_cn.eval()

    class TorchCLDMLike:
        """model/cldm.py:166-194 forward with control_scales == 1."""

        def __call__(self, x, t, cond):
            control = t_cn(x=x, hint=cond["c_img"], timesteps=t,
                           context=cond["c_txt"])
            return t_unet(x, timesteps=t, context=cond["c_txt"],
                          control=list(control))

    g = np.random.default_rng(11)
    x_T = g.standard_normal((1, 4, 8, 8)).astype(np.float32)
    c_img = g.standard_normal((1, 4, 8, 8)).astype(np.float32)
    c_txt = g.standard_normal((1, 7, 48)).astype(np.float32)
    used = [50, 100, 150, 200]
    step_noises = [g.standard_normal((1, 4, 8, 8)).astype(np.float32)
                   for _ in used]

    # --- torch side: preset the per-step noise draws -----------------------
    t_noises = [torch.from_numpy(n) for n in step_noises]
    t_iter = iter(t_noises)
    monkeypatch.setattr(torch, "randn_like", lambda x: next(t_iter))
    betas = make_beta_schedule("linear", 1000, 0.00085, 0.0120)
    t_sampler = ref_sampler_mod.SpacedSampler(betas)
    with torch.no_grad():
        ref_out = t_sampler.manual_sample_with_timesteps(
            TorchCLDMLike(), "cpu", torch.from_numpy(x_T), len(used), used,
            batch_size=1, cond={"c_img": torch.from_numpy(c_img),
                                "c_txt": torch.from_numpy(c_txt)},
            uncond=None, cfg_scale=1.0, progress=False,
        ).numpy()

    # --- schedule tables: exact parity with the registered buffers --------
    sched = make_spaced_schedule(betas, len(used), used)
    for name in ("sqrt_recip_alphas_cumprod", "sqrt_recipm1_alphas_cumprod",
                 "posterior_variance", "posterior_log_variance_clipped",
                 "posterior_mean_coef1", "posterior_mean_coef2"):
        np.testing.assert_allclose(
            np.asarray(getattr(sched, name)),
            getattr(t_sampler, name).numpy(), rtol=0, atol=1e-7, err_msg=name)

    # --- our side: same weights through the converter ---------------------
    unet_params = C.convert_ldm_unet(
        C.torch_state_dict_to_numpy(t_unet.state_dict()), **CONV_TINY)
    cn_params = C.convert_controlnet(
        C.torch_state_dict_to_numpy(t_cn.state_dict()), **CONV_TINY)
    our_unet = UNetModel(**OUR_TINY)
    our_cn = ControlNet(
        hint_channels=4,
        **{k: v for k, v in OUR_TINY.items() if k != "out_channels"})
    cond = {"c_img": jnp.asarray(c_img.transpose(0, 2, 3, 1)),
            "c_txt": jnp.asarray(c_txt)}

    def model_fn(x, t, c):
        control = our_cn.apply({"params": cn_params}, x, c["c_img"], t,
                               c["c_txt"])
        return our_unet.apply({"params": unet_params}, x, t, c["c_txt"],
                              control=control)

    # eager K-step loop with the SAME injected noise (jax.random.normal is
    # only reached from p_sample's stochastic term in this loop)
    j_noises = [jnp.asarray(n.transpose(0, 2, 3, 1)) for n in step_noises]
    j_iter = iter(j_noises)
    monkeypatch.setattr(jax.random, "normal",
                        lambda key, shape, dtype=jnp.float32: next(j_iter))
    x = jnp.asarray(x_T.transpose(0, 2, 3, 1))
    key = jax.random.PRNGKey(0)
    n = sched.num_steps
    for i, ts in enumerate(np.flip(np.asarray(sched.timesteps))):
        key, sub = jax.random.split(key)
        t = jnp.full((1,), int(ts), jnp.int32)
        index = jnp.full((1,), n - 1 - i, jnp.int32)
        x, _ = p_sample(model_fn, sched, x, t, index, cond, sub)
    monkeypatch.undo()

    np.testing.assert_allclose(
        np.asarray(x).transpose(0, 3, 1, 2), ref_out, rtol=1e-4, atol=1e-4)

    # --- and the compiled scan path reproduces the eager loop with REAL
    # noise for this exact model (the generic scan==loop test uses a toy fn)
    rng = jax.random.PRNGKey(42)
    out_scan = jax.jit(
        lambda xT, k: sample_scan(model_fn, sched, xT, cond, k)
    )(jnp.asarray(x_T.transpose(0, 2, 3, 1)), rng)
    x2 = jnp.asarray(x_T.transpose(0, 2, 3, 1))
    k2 = rng
    for i, ts in enumerate(np.flip(np.asarray(sched.timesteps))):
        k2, sub = jax.random.split(k2)
        t = jnp.full((1,), int(ts), jnp.int32)
        index = jnp.full((1,), n - 1 - i, jnp.int32)
        x2, _ = p_sample(model_fn, sched, x2, t, index, cond, sub)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(x2),
                               rtol=2e-5, atol=2e-5)


def test_scan_bodies_counted_matches_cost_analysis(monkeypatch):
    """scan_bodies_counted must predict how many scan-body copies XLA cost
    analysis reports, for every unroll mode the sampler can emit — the bench
    normalizes cost-analysis flops by it before scaling by trip count
    (an unrolled default would otherwise overcount MFU by the unroll factor;
    see results/chip_queue/bench_r4_defaults.log's 1.17 "MFU")."""
    from edtr_tpu.diffusion.sampler import scan_bodies_counted

    def measured_bodies(n, unroll):
        def body(c, _):
            return c @ c, None

        def f(x):
            y, _ = jax.lax.scan(body, x, None, length=n, unroll=unroll)
            return y

        x = jnp.ones((64, 64), jnp.float32)
        ex = jax.jit(f).lower(x).compile()
        cost = ex.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        base = 2 * 64 ** 3  # one body's matmul flops
        return round(float(cost["flops"]) / base)

    for n, u in [(4, 1), (4, 2), (4, 4), (5, 2), (6, 4), (4, 3)]:
        assert scan_bodies_counted(n, u) == measured_bodies(n, u), (n, u)

    # env-driven default path (what bench.py calls with unroll=None)
    monkeypatch.delenv("EDTR_SCAN_UNROLL", raising=False)
    assert scan_bodies_counted(4) == 1
    monkeypatch.setenv("EDTR_SCAN_UNROLL", "4")
    assert scan_bodies_counted(4) == 4
    monkeypatch.setenv("EDTR_SCAN_UNROLL", "3")
    assert scan_bodies_counted(4) == 4  # 3 main copies + 1 remainder
