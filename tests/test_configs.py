"""Every shipped config must load and instantiate its model tower.

VERDICT r1 #2: the reference ships 50 configs (cls/seg/det x train/test x
oracle/lq/swinir-pre/swinir/sr4ir/diffbir/edtr-s1/edtr-s4 + COCO + demo);
all of them exist here with the same `target:`/`params:` schema and resolve
through the registry (SURVEY.md §5.6 "reference configs run unmodified").
"""

import glob
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(
    os.path.relpath(p, REPO)
    for p in glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"),
                       recursive=True)
)

REFERENCE_CONFIGS = "/root/reference/configs"


def test_config_matrix_is_complete():
    """One of ours for every reference config (same relative path)."""
    if not os.path.isdir(REFERENCE_CONFIGS):
        pytest.skip("reference checkout not present")
    ref = sorted(
        os.path.relpath(p, REFERENCE_CONFIGS)
        for p in glob.glob(os.path.join(REFERENCE_CONFIGS, "**", "*.yaml"),
                           recursive=True)
    )
    mine = {os.path.relpath(os.path.join(REPO, c), os.path.join(REPO, "configs"))
            for c in CONFIGS}
    missing = [r for r in ref if r not in mine]
    assert not missing, f"configs missing vs reference: {missing}"
    assert len(CONFIGS) >= 50


@pytest.mark.parametrize("rel", CONFIGS)
def test_config_model_tower_instantiates(rel):
    from edtr_tpu.config import load_config, instantiate_from_config

    cfg = load_config(os.path.join(REPO, rel))
    assert "model" in cfg, rel
    model = cfg["model"]
    built = {}
    for name in model.keys():
        node = model[name]
        # skip scalar flags (pre_restoration etc.)
        try:
            has_target = "target" in node
        except TypeError:
            continue
        if not has_target:
            continue
        built[name] = instantiate_from_config(node)
    assert built, f"{rel}: no instantiable model nodes"
    # every recipe with a cldm must also declare the diffusion table
    if "cldm" in built:
        assert "diffusion" in built, rel
