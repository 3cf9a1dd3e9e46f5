"""Config-path gate for the SwinIR lane padding (round 5, VERDICT r4 #2).

The MXU lane alignment (embed_dim 180 -> 192) ships as a *serving-path*
default: inference configs get ``lane_pad=12`` on the flagship SwinIR,
training configs never do (random init of a padded module is a different
function — models/swinir.py lane_pad contract). Exactness of the padded
relayout itself is golden-tested in test_swinir_golden.py; this tier only
pins the gate plumbing (pipeline.build_pipeline_from_config +
runner.build_edtr_models init-then-pad ordering).
"""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def edtr_test_cfg():
    from edtr_tpu.config import load_config

    return load_config(
        os.path.join(REPO, "configs/det/voc2012/test/007_edtr-s4.yaml"))


@pytest.fixture()
def edtr_train_cfg():
    from edtr_tpu.config import load_config

    return load_config(
        os.path.join(REPO, "configs/det/voc2012/train/007_edtr-s4.yaml"))


def test_inference_config_gets_lane_pad(edtr_test_cfg, monkeypatch):
    from edtr_tpu.pipeline import build_pipeline_from_config

    monkeypatch.setenv("EDTR_SWINIR_PAD", "1")
    pipe = build_pipeline_from_config(edtr_test_cfg)
    assert pipe.swinir is not None
    assert pipe.swinir.lane_pad == 12
    assert pipe.swinir.embed_dim == 180  # logical width is unchanged

    monkeypatch.setenv("EDTR_SWINIR_PAD", "0")
    pipe = build_pipeline_from_config(edtr_test_cfg)
    assert pipe.swinir.lane_pad == 0


def test_train_config_never_pads(edtr_train_cfg, monkeypatch):
    from edtr_tpu.pipeline import build_pipeline_from_config

    monkeypatch.setenv("EDTR_SWINIR_PAD", "1")
    pipe = build_pipeline_from_config(edtr_train_cfg)
    assert pipe.swinir is not None
    assert pipe.swinir.lane_pad == 0


def test_padded_init_params_are_zero_padded(monkeypatch):
    """runner.build_edtr_models inits through an unpadded twin then pads:
    every padded channel must be exactly zero (the exactness contract)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from edtr_tpu.models.swinir import SwinIR
    from edtr_tpu.utils import convert as C

    # small-depth 180-dim net (same channel plumbing as the flagship)
    net = SwinIR(
        img_size=64, patch_size=1, in_chans=3, embed_dim=180,
        depths=(1,), num_heads=(6,), window_size=8, mlp_ratio=2,
        sf=8, img_range=1.0, upsampler="nearest+conv",
        resi_connection="1conv", unshuffle=True, unshuffle_scale=8,
        lane_pad=12,
    )
    unpadded = dataclasses.replace(net, lane_pad=0)
    x = jnp.zeros((1, 64, 64, 3))
    p0 = unpadded.init(jax.random.PRNGKey(0), x)["params"]
    p12 = C.pad_swinir_lanes(p0, lane_pad=12, heads=6)

    k = np.asarray(p12["conv_after_body"]["kernel"])
    assert k.shape[-1] == 192
    assert np.all(k[..., 180:] == 0) and np.all(k[:, :, 180:, :] == 0)

    # the padded module accepts the padded tree and matches the unpadded net
    y0 = unpadded.apply({"params": p0}, x)
    y12 = net.apply({"params": p12}, x)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y12),
                               rtol=0, atol=1e-5)
