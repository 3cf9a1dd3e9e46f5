"""Golden parity: ResNet / MobileNetV3 / DeepLabV3 vs reference torch modules
through the torchvision-family converters (eval mode, running BN stats)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edtr_tpu.models.resnet import ResNet
from edtr_tpu.models.mobilenetv3 import MobileNetV3
from edtr_tpu.models.deeplabv3 import DeepLabV3MobileNet
from edtr_tpu.utils import convert as C

from ref_loader import load_ref_module

pytestmark = pytest.mark.golden  # torch-oracle tier


def _randomize(m, seed=0, scale=0.05):
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in m.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
        for name, b in m.named_buffers():
            if name.endswith("running_var"):
                b.copy_(torch.rand(b.shape, generator=g) + 0.5)
            elif name.endswith("running_mean"):
                b.copy_(torch.randn(b.shape, generator=g) * 0.1)
    return m


def test_resnet18_logits_parity():
    import torch

    ref = load_ref_module("model.resnet")
    m = ref.ResNet(type=18, num_classes=7).eval()
    _randomize(m)
    g = np.random.default_rng(0)
    x = g.random((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(x), normalize=True).numpy()

    variables = C.convert_resnet(C.torch_state_dict_to_numpy(m.state_dict()), type=18)
    ours = ResNet(type=18, num_classes=7).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), normalize=True
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=5e-3, atol=5e-3)


def test_mobilenetv3_logits_parity():
    import torch

    ref = load_ref_module("model.mobilenetv3")
    m = ref.mobilenet_v3_large(num_classes=5).eval()
    _randomize(m)
    g = np.random.default_rng(1)
    x = g.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(x)).numpy()

    variables = C.convert_mobilenetv3(C.torch_state_dict_to_numpy(m.state_dict()))
    ours = MobileNetV3(num_classes=5).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, rtol=5e-3, atol=5e-3)


def test_deeplabv3_mobilenet_out_parity():
    import torch

    ref = load_ref_module("model.deeplabv3")
    m = ref.deeplabv3_mobilenet_v3_large(num_classes=4, aux_loss=True, weights_backbone=None).eval()
    _randomize(m)
    g = np.random.default_rng(2)
    x = g.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref_out = m(torch.from_numpy(x), normalize=True)["out"].numpy()

    variables = C.convert_deeplabv3_mobilenet(C.torch_state_dict_to_numpy(m.state_dict()))
    ours = DeepLabV3MobileNet(num_classes=4, aux_loss=True).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1)), normalize=True
    )["out"]
    np.testing.assert_allclose(
        np.asarray(ours).transpose(0, 3, 1, 2), ref_out, rtol=1e-2, atol=1e-2
    )


def test_fasterrcnn_converter_structure():
    """The detnet converter must produce exactly the shapes our FasterRCNN
    expects (structure-level check; torchvision.ops prevents running the
    reference detector end-to-end here)."""
    from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn

    det = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21)
    template = jax.jit(det.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3))
    )

    # build a torch-style state dict FROM the template shapes, then convert
    import torch

    ref_cn = load_ref_module("model.faster_rcnn")
    m = ref_cn.fasterrcnn_mobilenet_v3_large_fpn(num_classes=21)
    sd = C.torch_state_dict_to_numpy(m.state_dict())
    converted = C.convert_fasterrcnn_mobilenet(sd)

    t_leaves = jax.tree_util.tree_flatten_with_path(template["params"])[0]
    c_flat = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(converted["params"])[0]
    )
    missing, bad_shape = [], []
    for path, leaf in t_leaves:
        key = jax.tree_util.keystr(path)
        if key not in c_flat:
            missing.append(key)
        elif tuple(c_flat[key].shape) != tuple(leaf.shape):
            bad_shape.append((key, c_flat[key].shape, tuple(leaf.shape)))
    assert not missing, missing[:5]
    assert not bad_shape, bad_shape[:5]


def test_detnet_trainable_mask_parity():
    """The optax freezing mask must freeze exactly the features_{i} the
    reference's ``_mobilenet_extractor`` freezes (requires_grad=False) for
    trainable_layers in {0, 3, 6} (``model/faster_rcnn.py:658-668``)."""
    from edtr_tpu.models.faster_rcnn import (
        detnet_trainable_mask, fasterrcnn_mobilenet_v3_large_fpn, mask_detnet_tx,
    )

    ref_cn = load_ref_module("model.faster_rcnn")
    ref_mn = load_ref_module("model.mobilenetv3")

    det = fasterrcnn_mobilenet_v3_large_fpn(num_classes=5)
    variables = jax.jit(det.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3))
    )
    params = variables["params"]

    for tl in (0, 3, 6):
        m = ref_mn.mobilenet_v3_large()
        ref_cn._mobilenet_extractor(m, True, tl)
        ref_frozen = {
            f"features_{i}"
            for i, b in enumerate(m.features)
            if any(not p.requires_grad for p in b.parameters())
        }
        mask = detnet_trainable_mask(params, "mobilenet_v3_large_fpn", tl)
        ours_frozen = {
            name
            for name, sub in mask["body"].items()
            if not all(jax.tree.leaves(sub))
        }
        assert ours_frozen == ref_frozen, (tl, ours_frozen ^ ref_frozen)
        # non-body heads always train
        for top, sub in mask.items():
            if top != "body":
                assert all(jax.tree.leaves(sub)), top

    # functional: frozen leaves get zero updates, trainable leaves move
    import optax

    tx = mask_detnet_tx(optax.sgd(1e-2), params)
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    mask3 = detnet_trainable_mask(params, "mobilenet_v3_large_fpn", 3)
    flat_u = jax.tree_util.tree_flatten_with_path(updates)[0]
    flat_m = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(mask3)[0]
    )
    n_frozen = 0
    for path, u in flat_u:
        key = jax.tree_util.keystr(path)
        if flat_m[key]:
            assert float(jnp.abs(u).max()) > 0, key
        else:
            assert float(jnp.abs(u).max()) == 0, key
            n_frozen += 1
    assert n_frozen > 0
