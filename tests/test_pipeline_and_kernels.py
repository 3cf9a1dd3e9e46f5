"""End-to-end slices: flash kernel numerics, DiffJPEG golden, train steps,
RealESRGAN transform, tiny EDTR pipeline restore."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.parametrize("seq", [512, 1024, 2048])
def test_flash_attention_matches_xla_interpret(seq):
    # 512/1024 exercise the whole-sequence VMEM kernel, 2048 the blockwise
    # online-softmax kernel
    from edtr_tpu.ops.attention import _xla_attention
    from edtr_tpu.ops.flash_attention import flash_attention, shapes_supported

    g = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(g, 3)
    q = jax.random.normal(k1, (1, seq, 2, 64), jnp.float32)
    k = jax.random.normal(k2, (1, seq, 2, 64), jnp.float32)
    v = jax.random.normal(k3, (1, seq, 2, 64), jnp.float32)
    assert shapes_supported(q, k, v)
    scale = 64 ** -0.5
    o_flash = flash_attention(q, k, v, scale)
    o_xla = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(
        np.asarray(o_flash), np.asarray(o_xla), rtol=2e-3, atol=2e-3
    )


def test_flash_bigseq_wholekv_matches_online_and_xla(monkeypatch):
    """The q-blocked whole-KV kernel (the round-5 ds=1 default for
    2048<=N<=4096) must match the online-softmax kernel and XLA, forward
    and backward, on the flagship 4096x64 shape."""
    import functools

    from edtr_tpu.ops.attention import _xla_attention
    from edtr_tpu.ops import flash_attention as F

    g = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(g, 3)
    q = jax.random.normal(k1, (1, 4096, 2, 64), jnp.float32)
    k = jax.random.normal(k2, (1, 4096, 2, 64), jnp.float32)
    v = jax.random.normal(k3, (1, 4096, 2, 64), jnp.float32)
    scale = 64 ** -0.5

    def loss(fn, q_, k_, v_):
        out = fn(q_, k_, v_, scale)
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return (out * w).sum()

    outs, grads = {}, {}
    for variant in ("wholekv", "online"):
        monkeypatch.setenv("EDTR_FLASH_BIGSEQ", variant)
        outs[variant] = F.flash_attention(q, k, v, scale)
        grads[variant] = jax.grad(
            functools.partial(loss, F.flash_attention), argnums=(0, 1, 2)
        )(q, k, v)
    o_xla = _xla_attention(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(outs["wholekv"]),
                               np.asarray(o_xla), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(outs["wholekv"]),
                               np.asarray(outs["online"]), rtol=1e-5,
                               atol=1e-5)
    for name, a, b in zip(("dq", "dk", "dv"),
                          grads["wholekv"], grads["online"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_flash_attention_wide_head_vae_shape():
    # the VAE mid-attention: single head, D=512, 4096 tokens — streamed-KV
    # kernel (KV blocks via the grid; whole-KV residency would double-buffer
    # past the 16 MB VMEM limit on TPU)
    from edtr_tpu.ops.attention import _xla_attention
    from edtr_tpu.ops.flash_attention import flash_attention, shapes_supported

    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(ks[0], (1, 4096, 1, 512), jnp.bfloat16)
    k = jax.random.normal(ks[1], (1, 4096, 1, 512), jnp.bfloat16)
    v = jax.random.normal(ks[2], (1, 4096, 1, 512), jnp.bfloat16)
    assert shapes_supported(q, k, v)
    scale = 512 ** -0.5
    o_flash = flash_attention(q, k, v, scale).astype(jnp.float32)
    o_xla = _xla_attention(q, k, v, scale).astype(jnp.float32)
    np.testing.assert_allclose(
        np.asarray(o_flash), np.asarray(o_xla), rtol=2e-2, atol=2e-2
    )


@pytest.mark.parametrize("seq,d", [(1024, 64), (2048, 64), (2048, 256)])
def test_flash_attention_gradients(seq, d):
    # (2048, 256) covers the wide-head path: streamed-KV forward + the XLA
    # backward reconstruction from the saved logsumexp (train_decoder hits it)
    from edtr_tpu.ops.attention import _xla_attention
    from edtr_tpu.ops.flash_attention import flash_attention

    g = jax.random.PRNGKey(1)
    k1, k2, k3 = jax.random.split(g, 3)
    q = jax.random.normal(k1, (1, seq, 1, d), jnp.float32)
    k = jax.random.normal(k2, (1, seq, 1, d), jnp.float32)
    v = jax.random.normal(k3, (1, seq, 1, d), jnp.float32)
    scale = d ** -0.5

    def loss(fn, q_, k_, v_):
        # non-uniform cotangent so dK/dV are nontrivial
        out = fn(q_, k_, v_, scale)
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return (out * w).sum()

    gf = jax.grad(functools.partial(loss, flash_attention), argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(functools.partial(loss, _xla_attention), argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gf, gx):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=f"flash backward {name} mismatch")


@pytest.mark.golden
def test_diffjpeg_golden_vs_reference():
    import torch

    from ref_loader import load_ref_module
    from edtr_tpu.data.diffjpeg import diff_jpeg

    ref = load_ref_module("datasets.diffjpeg")
    g = np.random.default_rng(0)
    x = g.random((2, 40, 56, 3)).astype(np.float32)
    q = np.array([35.0, 80.0], np.float32)
    m = ref.DiffJPEG(differentiable=False).eval()
    with torch.no_grad():
        ref_out = m(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            quality=torch.from_numpy(q.copy()),
        ).numpy()
    ours = np.asarray(diff_jpeg(jnp.asarray(x), jnp.asarray(q)))
    d = np.abs(ours.transpose(0, 3, 1, 2) - ref_out)
    # hard-rounding flips single DCT coefficients at fp tie-breaks; the
    # mean error bound is the meaningful one for a degradation op
    assert d.mean() < 0.02, d.mean()


def test_diffjpeg_differentiable_close():
    from edtr_tpu.data.diffjpeg import diff_jpeg

    g = np.random.default_rng(1)
    x = jnp.asarray(g.random((1, 32, 32, 3)), jnp.float32)
    out = diff_jpeg(x, 90.0, differentiable=True)
    assert out.shape == x.shape
    # gradient flows through the soft rounding
    grad = jax.grad(lambda v: diff_jpeg(v, 90.0, differentiable=True).sum())(x)
    assert np.isfinite(np.asarray(grad)).all()


def _tiny_pipe():
    import __graft_entry__ as G

    return G._flagship_pipeline(dtype=None, tiny=True)


@pytest.fixture(scope="module")
def tiny_setup():
    import __graft_entry__ as G

    pipe = _tiny_pipe()
    params = G._init_params(pipe, jax.random.PRNGKey(0), 64)
    return pipe, params


def test_edtr_restore_shapes(tiny_setup):
    pipe, params = tiny_setup
    lq = jnp.zeros((1, 64, 64, 3), jnp.float32)
    c_txt = jnp.zeros((1, pipe.cldm.clip.context_length, pipe.cldm.clip.width))
    out = pipe.restore(params, lq, jax.random.PRNGKey(0), c_txt=c_txt)
    assert out["restored"].shape == (1, 64, 64, 3)
    assert out["z"].shape == (1, 8, 8, 4)
    assert np.isfinite(np.asarray(out["restored"])).all()


def test_edtr_train_step_updates_trainable_only(tiny_setup):
    from edtr_tpu.train.edtr_step import EDTRTrainState, make_edtr_train_step

    pipe, params0 = tiny_setup
    # step donates its state; work on copies so the fixture stays alive
    params = jax.tree.map(jnp.copy, params0)
    # at random init the UNet's zero-init out_conv blocks every gradient
    # (eps is constant); give it weight like a loaded SD checkpoint would
    params["unet"]["out_conv"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9),
                          params["unet"]["out_conv"]["kernel"].shape) * 0.05
    )
    ref_params = jax.tree.map(jnp.copy, params)
    state = EDTRTrainState.create(pipe, params)
    step = make_edtr_train_step(pipe)
    batch = dict(
        lq=jnp.ones((2, 64, 64, 3)) * 0.25,
        gt=jnp.ones((2, 64, 64, 3)) * 0.5,
        c_txt=jnp.zeros((2, pipe.cldm.clip.context_length, pipe.cldm.clip.width)),
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(metrics["loss_hlf"]))
    # ControlNet moved, UNet frozen
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        ref_params["controlnet"], new_state.params["controlnet"],
    )
    assert max(jax.tree.leaves(moved)) > 0
    frozen = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        ref_params["unet"], new_state.params["unet"],
    )
    assert max(jax.tree.leaves(frozen)) == 0


def test_task_train_step_cls():
    from edtr_tpu.models.resnet import ResNet
    from edtr_tpu.train.recipes import (
        SimpleTrainState,
        cosine_tx,
        cross_entropy,
        make_task_train_step,
    )

    net = ResNet(type=18, num_classes=10)
    variables = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))

    def loss_fn(p, extra, images, labels, rng):
        out, ups = net.apply(
            {"params": p, **extra}, images, normalize=True, train=True,
            mutable=["batch_stats"],
        )
        return cross_entropy(out, labels), ({}, dict(ups))

    state = SimpleTrainState.create(variables, cosine_tx("sgd", 0.1, 100))
    step = make_task_train_step(loss_fn)
    batch = dict(
        gt=jnp.ones((2, 32, 32, 3)) * 0.5,
        lq=jnp.ones((2, 32, 32, 3)) * 0.2,
        target=jnp.asarray([1, 2], jnp.int32),
    )
    s2, m = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(s2.step) == 1


def test_seg_cross_entropy_ignores_255():
    from edtr_tpu.train.recipes import seg_cross_entropy

    logits = jnp.zeros((1, 4, 4, 3))
    mask = jnp.full((1, 4, 4), 255, jnp.int32)
    mask = mask.at[0, 0, 0].set(1)
    loss = seg_cross_entropy(logits, mask)
    np.testing.assert_allclose(float(loss), np.log(3), rtol=1e-5)


def test_realesrgan_transform_smoke():
    from edtr_tpu.data.realesrgan import RealESRGANBatchTransform

    t = RealESRGANBatchTransform(queue_size=0, stage2_scale=4, seed=3)
    g = np.random.default_rng(0)
    batch = dict(
        hq=g.random((2, 64, 64, 3)).astype(np.float32),
        kernel1=np.eye(21, dtype=np.float32)[None].repeat(2, 0) / 21,
        kernel2=np.eye(21, dtype=np.float32)[None].repeat(2, 0) / 21,
        sinc_kernel=np.eye(21, dtype=np.float32)[None].repeat(2, 0) / 21,
    )
    out = t(batch)
    assert out["GT"].shape == (2, 64, 64, 3)
    assert out["LQ"].shape == (2, 64, 64, 3)
    lq = np.asarray(out["LQ"])
    assert np.isfinite(lq).all() and 0 <= lq.min() and lq.max() <= 1


def test_edtr_train_step_with_detnet(tiny_setup):
    from edtr_tpu.models.faster_rcnn import FasterRCNN
    from edtr_tpu.train.edtr_step import EDTRTrainState, make_edtr_train_step

    pipe, params0 = tiny_setup
    params = jax.tree.map(jnp.copy, params0)
    params["unet"]["out_conv"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9),
                          params["unet"]["out_conv"]["kernel"].shape) * 0.05
    )
    detnet = FasterRCNN(
        num_classes=5, min_size=64, max_size=128,
        rpn_pre_nms_top_n_train=50, rpn_post_nms_top_n_train=30,
        rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=30,
        box_batch_size_per_image=16, box_detections_per_img=5,
    )
    det_vars = jax.jit(detnet.init)(
        {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3))
    )
    params["detnet"] = det_vars
    params["teacher_detnet"] = jax.tree.map(jnp.copy, det_vars)
    det_ref = jax.tree.map(jnp.copy, det_vars["params"])

    state = EDTRTrainState.create(pipe, params)
    step = make_edtr_train_step(pipe, detnet=detnet)
    batch = dict(
        lq=jnp.ones((2, 64, 64, 3)) * 0.25,
        gt=jnp.ones((2, 64, 64, 3)) * 0.5,
        c_txt=jnp.zeros((2, pipe.cldm.clip.context_length, pipe.cldm.clip.width)),
        targets=dict(
            boxes=jnp.asarray([[[5, 5, 30, 30]]] * 2, jnp.float32),
            labels=jnp.asarray([[1]] * 2, jnp.int32),
            valid=jnp.ones((2, 1), bool),
        ),
    )
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
    for k in ("loss_hlf", "loss_det", "loss_fm"):
        assert k in metrics and np.isfinite(float(metrics[k])), (k, metrics)
    # the detnet half must move detnet params (SGD with momentum + wd)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        det_ref, new_state.params["detnet"]["params"],
    )
    assert max(jax.tree.leaves(moved)) > 0


def test_sample_fn_staged_matches_monolith(tiny_setup):
    """The staged 4-executable eval dispatch is numerically the monolith."""
    from edtr_tpu.train.edtr_step import make_edtr_sample_fn

    pipe, params = tiny_setup
    lq = jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3))
    c_txt = jnp.zeros((2, pipe.cldm.clip.context_length, pipe.cldm.clip.width))
    rng = jax.random.PRNGKey(7)
    staged = make_edtr_sample_fn(pipe, staged=True)(params, lq, c_txt, rng)
    mono = make_edtr_sample_fn(pipe, staged=False)(params, lq, c_txt, rng)
    np.testing.assert_allclose(
        np.asarray(staged, np.float32), np.asarray(mono, np.float32),
        rtol=2e-5, atol=2e-5)


def test_edtr_train_step_grad_accumulation(tiny_setup):
    """accum_steps=K: reference global-batch semantics on one device.

    One global batch of 4 runs as 2 microbatches of 2 under a lax.scan;
    asserts the full two-half update completes, detnet params AND BatchNorm
    running stats move (sequential per-microbatch updates, torch parity),
    ControlNet moves, UNet stays frozen, and the compiled step is
    deterministic (bit-identical params on a re-run from the same state).
    """
    from edtr_tpu.models.faster_rcnn import FasterRCNN
    from edtr_tpu.train.edtr_step import EDTRTrainState, make_edtr_train_step

    pipe, params0 = tiny_setup

    def fresh_params():
        params = jax.tree.map(jnp.copy, params0)
        params["unet"]["out_conv"]["kernel"] = (
            jax.random.normal(jax.random.PRNGKey(9),
                              params["unet"]["out_conv"]["kernel"].shape) * 0.05
        )
        detnet = FasterRCNN(
            num_classes=5, min_size=64, max_size=128,
            rpn_pre_nms_top_n_train=50, rpn_post_nms_top_n_train=30,
            rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=30,
            box_batch_size_per_image=16, box_detections_per_img=5,
        )
        det_vars = jax.jit(detnet.init)(
            {"params": jax.random.PRNGKey(1)}, jnp.zeros((1, 64, 64, 3))
        )
        params["detnet"] = det_vars
        params["teacher_detnet"] = jax.tree.map(jnp.copy, det_vars)
        return detnet, params

    detnet, params = fresh_params()
    assert not detnet.norm_frozen  # direct ctor => plain BN, train-mode stats
    det_ref = jax.tree.map(jnp.copy, params["detnet"]["params"])
    bn_ref = jax.tree.map(jnp.copy, params["detnet"]["batch_stats"])
    cn_ref = jax.tree.map(jnp.copy, params["controlnet"])
    un_ref = jax.tree.map(jnp.copy, params["unet"])

    batch = dict(
        lq=jax.random.uniform(jax.random.PRNGKey(11), (4, 64, 64, 3)),
        gt=jax.random.uniform(jax.random.PRNGKey(12), (4, 64, 64, 3)),
        c_txt=jnp.zeros((4, pipe.cldm.clip.context_length, pipe.cldm.clip.width)),
        targets=dict(
            boxes=jnp.asarray([[[5, 5, 30, 30]]] * 4, jnp.float32),
            labels=jnp.asarray([[1]] * 4, jnp.int32),
            valid=jnp.ones((4, 1), bool),
        ),
    )
    step = make_edtr_train_step(pipe, detnet=detnet, accum_steps=2)
    state = EDTRTrainState.create(pipe, params)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(4))
    for k in ("loss_hlf", "loss_det", "loss_fm"):
        assert k in metrics and np.isfinite(float(metrics[k])), (k, metrics)

    def max_delta(a, b):
        return max(jax.tree.leaves(jax.tree.map(
            lambda x, y: float(jnp.abs(x - y).max()), a, b)))

    assert max_delta(det_ref, new_state.params["detnet"]["params"]) > 0
    assert max_delta(bn_ref, new_state.params["detnet"]["batch_stats"]) > 0
    assert max_delta(cn_ref, new_state.params["controlnet"]) > 0
    assert max_delta(un_ref, new_state.params["unet"]) == 0

    # determinism: a fresh state + the same rng reproduces bit-identical params
    detnet2, params2 = fresh_params()
    state2 = EDTRTrainState.create(pipe, params2)
    new_state2, _ = step(state2, batch, jax.random.PRNGKey(4))
    assert max_delta(new_state.params["controlnet"],
                     new_state2.params["controlnet"]) == 0
    assert max_delta(new_state.params["detnet"]["params"],
                     new_state2.params["detnet"]["params"]) == 0
