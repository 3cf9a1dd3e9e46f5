"""FSDP/ZeRO param+optimizer sharding correctness on the virtual mesh.

Beyond reference parity (the reference is DDP with fully replicated state,
``/root/reference/main/det/train_edtr.py:35-36``): GSPMD weight sharding
over the ``data`` axis, composed with the Megatron TP rules
(``edtr_tpu/parallel/fsdp.py``). Pins the three things we rely on:
placement preserves forward/grad values exactly, the rules genuinely cut
per-device weight memory ~1/N, and an optimizer update keeps the sharded
placement (ZeRO semantics, not a one-step gather-back-to-replicated).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from edtr_tpu.parallel.fsdp import (
    fsdp_param_bytes,
    fsdp_shardings,
    fsdp_spec,
    shard_params_fsdp,
)
from edtr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from tests.test_tensor_parallel import TINY, _tiny_unet_and_inputs


def _mesh_2d(n_data, n_model=1):
    devices = jax.devices("cpu")
    if len(devices) < n_data * n_model:
        pytest.skip(f"need {n_data * n_model} virtual devices")
    return make_mesh(n_data, n_model, devices=devices[: n_data * n_model])


def test_fsdp_spec_rules():
    # plain big matrix: largest dim goes to data
    assert fsdp_spec("x/kernel", (256, 1024), 8) == P(None, DATA_AXIS)
    # composes with TP: to_q is column-split on model, data takes dim 0
    assert fsdp_spec("a/to_q/kernel", (512, 512), 4, 2) == P(
        DATA_AXIS, MODEL_AXIS)
    # conv kernel: biggest free dim (Cin here) takes data
    assert fsdp_spec("b/conv/kernel", (3, 3, 256, 128), 8) == P(
        None, None, DATA_AXIS, None)
    # small leaves replicate (all-gather latency > memory saved)
    assert fsdp_spec("a/norm/scale", (320,), 8) == P()
    # indivisible dims fall back rather than error
    assert fsdp_spec("x/kernel", (7, 9), 8) == P()


def test_fsdp_cuts_per_device_bytes():
    mesh = _mesh_2d(8, 1)
    _, params, *_ = _tiny_unet_and_inputs()
    per_dev, total = fsdp_param_bytes(params, mesh, min_bytes=1 << 10)
    # the GEMM-heavy UNet should shard the bulk of its bytes 8-ways
    assert per_dev < 0.35 * total, (per_dev, total)


def test_fsdp_unet_forward_and_grads_match_single_device():
    mesh = _mesh_2d(4, 2)
    m, params, x, t, ctx = _tiny_unet_and_inputs(batch=4)

    def loss(p, x_, t_, c_):
        return (m.apply({"params": p}, x_, t_, c_) ** 2).mean()

    l1, g1 = jax.jit(jax.value_and_grad(loss))(params, x, t, ctx)

    p_sh = shard_params_fsdp(params, mesh, min_bytes=1 << 10)
    shard = NamedSharding(mesh, P(DATA_AXIS))
    jvg = jax.jit(jax.value_and_grad(loss),
                  in_shardings=(None, shard, shard, shard))
    with mesh:
        l2, g2 = jvg(p_sh, x, t, ctx)

    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, rtol=0, atol=2e-5 * scale)


def test_fsdp_optimizer_update_stays_sharded():
    """ZeRO semantics: params, grads and Adam moments all keep the data-axis
    placement through a jitted optimizer step — no silent gather."""
    mesh = _mesh_2d(8, 1)
    _, params, x, t, ctx = _tiny_unet_and_inputs(batch=8)
    m = __import__("edtr_tpu.models.unet", fromlist=["UNetModel"]) \
        .UNetModel(**TINY)

    tx = optax.adamw(1e-3)
    p_sh = shard_params_fsdp(params, mesh, min_bytes=1 << 10)
    with mesh:
        opt = jax.jit(tx.init)(p_sh)

        def step(p, o, x_, t_, c_):
            g = jax.grad(
                lambda q: (m.apply({"params": q}, x_, t_, c_) ** 2).mean())(p)
            up, o2 = tx.update(g, o, p)
            return optax.apply_updates(p, up), o2

        shard = NamedSharding(mesh, P(DATA_AXIS))
        p2, opt2 = jax.jit(step, in_shardings=(None, None, shard, shard,
                                               shard))(p_sh, opt, x, t, ctx)

    def sharded_leaves(tree):
        return [leaf for leaf in jax.tree.leaves(tree)
                if DATA_AXIS in str(leaf.sharding.spec)]

    assert sharded_leaves(p2), "updated params lost the FSDP placement"
    assert sharded_leaves(opt2), "Adam moments are not sharded"
    # and the update really happened
    delta = max(float(jnp.abs(a - b).max()) for a, b in
                zip(jax.tree.leaves(p_sh), jax.tree.leaves(p2)))
    assert delta > 0
