"""LPIPS golden test: flax implementation + converter vs a torch oracle.

The `lpips` pip package and its pretrained weights are absent, so the
oracle is built here from the published LPIPS graph (Zhang et al. 2018;
scaling layer -> AlexNet/VGG16 feature taps -> unit-normalize -> squared
diff -> non-negative 1x1 lin heads -> spatial mean -> sum) with random
weights, and its state dict is emitted under the package's key naming to
exercise ``convert_lpips`` end to end.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edtr_tpu.models.lpips import LPIPS
from edtr_tpu.utils.convert import convert_lpips

torch = pytest.importorskip("torch")
from torch import nn  # noqa: E402

pytestmark = pytest.mark.golden  # torch-oracle tier

_SHIFT = (-0.030, -0.088, -0.188)
_SCALE = (0.458, 0.448, 0.450)


def _alex_features():
    return nn.Sequential(
        nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(),                  # 0 1
        nn.MaxPool2d(3, 2), nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(),   # 2 3 4
        nn.MaxPool2d(3, 2), nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),  # 5 6 7
        nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),                # 8 9
        nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),                # 10 11
    )


def _vgg_features():
    layers, cin = [], 3
    for ch, reps in ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3)):
        for _ in range(reps):
            layers += [nn.Conv2d(cin, ch, 3, 1, 1), nn.ReLU()]
            cin = ch
        layers.append(nn.MaxPool2d(2, 2))
    return nn.Sequential(*layers[:-1])  # lpips slices stop at relu5_3


_TAPS = {"alex": (1, 4, 7, 9, 11), "vgg": (3, 8, 15, 22, 29)}
_SLICE_KEYS = {
    "alex": {0: "slice1.0", 3: "slice2.3", 6: "slice3.6", 8: "slice4.8",
             10: "slice5.10"},
    "vgg": None,  # derived below from tap ranges
}


def _torch_lpips(feats, lins, x, y, taps):
    shift = torch.tensor(_SHIFT).view(1, 3, 1, 1)
    scale = torch.tensor(_SCALE).view(1, 3, 1, 1)

    def run(z):
        z = (z - shift) / scale
        outs = []
        for i, m in enumerate(feats):
            z = m(z)
            if i in taps:
                outs.append(z)
        return outs

    fx, fy = run(x), run(y)
    total = 0
    for a, b, lin in zip(fx, fy, lins):
        a = a / torch.sqrt((a * a).sum(1, keepdim=True) + 1e-10)
        b = b / torch.sqrt((b * b).sum(1, keepdim=True) + 1e-10)
        total = total + lin((a - b) ** 2).mean(dim=(1, 2, 3))
    return total


def _package_state_dict(feats, lins, net):
    """Emit the lpips-package key naming for convert_lpips."""
    sd = {}
    if net == "alex":
        for fi, loc in _SLICE_KEYS["alex"].items():
            sd[f"net.{loc}.weight"] = feats[fi].weight
            sd[f"net.{loc}.bias"] = feats[fi].bias
    else:
        # vgg slices: features idx ranges [0,4) [4,9) [9,16) [16,23) [23,30)
        starts = (0, 4, 9, 16, 23)
        for fi, m in enumerate(feats):
            if not isinstance(m, nn.Conv2d):
                continue
            si = max(s for s in range(5) if starts[s] <= fi)
            sd[f"net.slice{si + 1}.{fi}.weight"] = m.weight
            sd[f"net.slice{si + 1}.{fi}.bias"] = m.bias
    for i, lin in enumerate(lins):
        sd[f"lin{i}.model.1.weight"] = lin.weight
    return sd


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_golden(net):
    torch.manual_seed(0)
    feats = _alex_features() if net == "alex" else _vgg_features()
    with torch.no_grad():
        for p in feats.parameters():
            p.copy_(torch.randn_like(p) * 0.08)
    chans = (64, 192, 384, 256, 256) if net == "alex" else (64, 128, 256, 512, 512)
    lins = [nn.Conv2d(c, 1, 1, bias=False) for c in chans]
    with torch.no_grad():
        for lin in lins:
            lin.weight.copy_(torch.rand_like(lin.weight) * 0.1)  # non-negative

    size = 64
    x = torch.rand(2, 3, size, size) * 2 - 1
    y = torch.rand(2, 3, size, size) * 2 - 1
    with torch.no_grad():
        ref = _torch_lpips(feats, lins, x, y, set(_TAPS[net])).numpy()

    params = convert_lpips(_package_state_dict(feats, lins, net), net=net)
    module = LPIPS(net=net)
    ours = module.apply(
        {"params": params},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(y.numpy().transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-3, atol=2e-4)


def test_calculate_lpips_gated():
    from edtr_tpu.utils.image import calculate_lpips

    with pytest.raises(NotImplementedError):
        calculate_lpips(jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 32, 32, 3)))
