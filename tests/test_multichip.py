"""Multi-chip (mesh-sharded) training-step correctness on 8 virtual devices.

VERDICT r1 #1: the data-parallel path must be exercised by the suite, not
just the driver dryrun. Data-parallel jit with a sharded batch must produce
the SAME losses as the unsharded step (XLA inserts the psum; the math is the
mean over the global batch either way). Parity target: DDP semantics of
``/root/reference/main/det/train_edtr.py:35-36,138-139``.
"""

import sys

import numpy as np
import pytest
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")


def _mesh(n=8):
    from edtr_tpu.parallel.mesh import make_mesh

    devices = jax.devices("cpu")
    if len(devices) < n:
        pytest.skip(f"need {n} virtual devices, have {len(devices)}")
    return make_mesh(n, devices=devices[:n])


def test_sharded_swinir_pre_step_matches_unsharded():
    """Fast tier: one SwinIR-pre update, mesh-sharded batch vs single device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from edtr_tpu.models.swinir import SwinIR
    from edtr_tpu.train.recipes import SimpleTrainState, cosine_tx, \
        make_swinir_pre_train_step

    mesh = _mesh(8)
    swinir = SwinIR(embed_dim=16, depths=(2,), num_heads=(2,), window_size=4,
                    mlp_ratio=2, sf=8, upsampler="nearest+conv",
                    unshuffle=True, unshuffle_scale=8)
    rng = np.random.default_rng(0)
    lq = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    gt = jnp.asarray(rng.random((8, 32, 32, 3), np.float32))
    variables = jax.jit(swinir.init)(jax.random.PRNGKey(0), lq[:1])

    def loss_and_grads(p, lq_, gt_):
        def loss_fn(pp):
            res = swinir.apply({"params": pp}, lq_)
            return jnp.abs(res - gt_).mean() * 255.0

        return jax.value_and_grad(loss_fn)(p)

    # unsharded
    l1, g1 = jax.jit(loss_and_grads)(variables["params"], lq, gt)
    # mesh-sharded batch (XLA inserts the grad psum)
    shard = NamedSharding(mesh, P("data"))
    jfn = jax.jit(loss_and_grads, in_shardings=(None, shard, shard))
    with mesh:
        l8, g8 = jfn(variables["params"], lq, gt)

    np.testing.assert_allclose(float(l1), float(l8), rtol=1e-5)
    # gradients must match: psum over shards == global mean
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-8)
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-4 * scale)

    # and one full optimizer step runs under the mesh
    state = SimpleTrainState.create(variables, cosine_tx("adamw", 1e-4, 100))
    step = make_swinir_pre_train_step(swinir, jit=False)
    jstep = jax.jit(step, in_shardings=(None, {"lq": shard, "gt": shard}, None))
    with mesh:
        s8, m8 = jstep(state, {"lq": lq, "gt": gt}, jax.random.PRNGKey(1))
    np.testing.assert_allclose(float(m8["loss"]), float(l8), rtol=1e-5)


@pytest.mark.golden
@pytest.mark.parametrize("n_data,n_model", [(8, 1), (4, 2)],
                         ids=["dp8", "dp4xtp2"])
def test_sharded_edtr_full_step_matches_unsharded(n_data, n_model):
    """Full EDTR two-optimizer step (incl. tiny detnet: detection losses,
    NMS, RoIAlign) sharded over the 8-device mesh == unsharded, fp32.

    The dp4xtp2 case is the mesh ``dryrun_multichip`` runs by default:
    batch over "data", transformer/ResBlock GEMMs Megatron-split over
    "model" (edtr_tpu/parallel/tp.py)."""
    from __graft_entry__ import _flagship_pipeline, _init_params, _tiny_detnet
    from edtr_tpu.parallel.mesh import make_mesh
    from edtr_tpu.parallel.tp import shard_params
    from edtr_tpu.train.edtr_step import EDTRTrainState, make_edtr_train_step

    devices = jax.devices("cpu")
    if len(devices) < n_data * n_model:
        pytest.skip(f"need {n_data * n_model} virtual devices")
    mesh = make_mesh(n_data, n_model, devices=devices[: n_data * n_model])
    image_size = 64
    pipe = _flagship_pipeline(dtype=None, tiny=True)  # fp32 for tight compare
    params = _init_params(pipe, jax.random.PRNGKey(0), image_size)
    detnet = _tiny_detnet(image_size, dtype=None)
    det_vars = jax.jit(detnet.init)(
        {"params": jax.random.PRNGKey(7)},
        jnp.zeros((1, image_size, image_size, 3)))
    params["detnet"] = det_vars
    params["teacher_detnet"] = jax.tree.map(jnp.copy, det_vars)

    rng = np.random.default_rng(3)
    batch = {
        "lq": jnp.asarray(rng.random((8, image_size, image_size, 3), np.float32)),
        "gt": jnp.asarray(rng.random((8, image_size, image_size, 3), np.float32)),
        "c_txt": jnp.asarray(rng.normal(
            0, 1, (8, pipe.cldm.clip.context_length, pipe.cldm.clip.width)
        ).astype(np.float32)),
        "targets": {
            "boxes": jnp.tile(jnp.asarray(
                [[4.0, 4.0, 40.0, 40.0], [20.0, 10.0, 60.0, 50.0],
                 [8.0, 30.0, 30.0, 62.0], [0.0, 0.0, 0.0, 0.0]],
                jnp.float32)[None], (8, 1, 1)),
            "labels": jnp.tile(jnp.asarray([1, 2, 3, 0], jnp.int32)[None], (8, 1)),
            "valid": jnp.tile(jnp.asarray([True, True, True, False])[None], (8, 1)),
        },
    }

    def run(mesh_):
        state = EDTRTrainState.create(
            pipe, jax.tree.map(jnp.copy, params))
        step = make_edtr_train_step(pipe, detnet=detnet, mesh=mesh_)
        if mesh_ is None:
            _, metrics = step(state, batch, jax.random.PRNGKey(1))
            return metrics
        if n_model > 1:
            state = shard_params(state, mesh_)
        with mesh_:
            _, metrics = step(state, batch, jax.random.PRNGKey(1))
            return metrics

    m1 = run(None)
    m8 = run(mesh)
    assert set(m1) == set(m8)
    for k in ("loss_hlf", "loss_det", "loss_fm", "loss_objectness",
              "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"):
        assert k in m1, f"missing {k}"
        np.testing.assert_allclose(
            float(m1[k]), float(m8[k]), rtol=5e-4, atol=1e-6,
            err_msg=f"sharded vs unsharded {k}")
