"""FSDP / ZeRO-style sharding of params + optimizer state over ``data``.

The reference replicates the full model per GPU and all-reduces grads (DDP
via Accelerate, ``/root/reference/main/det/train_edtr.py:35-36``); its peak
per-device memory is params + grads + both Adam moments, full-size. The
TPU-native upgrade is GSPMD weight sharding: every large parameter leaf is
split over the ``data`` mesh axis, and — because the optimizer update runs
inside the same jitted step — the grads and Adam/SGD moments inherit the
same placement, so parameter, gradient AND optimizer memory all scale as
1/N_data (ZeRO-3 semantics). XLA inserts the weight all-gather right
before each use and the gradient reduce-scatter after each backward
contraction; nothing is hand-written, so correctness is placement-
independent.

Composition with tensor parallelism (``edtr_tpu/parallel/tp.py``): a leaf's
TP rule may already shard one dim over ``model``; FSDP then shards the
*largest remaining* divisible dim over ``data`` — the classic 2-D layout
(e.g. an attention ``to_q`` kernel (C, C) becomes P("data", "model")).
Leaves smaller than ``min_bytes`` stay on the TP spec alone: gathering a
4 KB bias per step costs more latency than the memory it frees.

Like ``tp.shard_params``, placements are committed via ``device_put`` so a
jitted step whose state ``in_shardings`` is ``None`` adopts them as-is —
``make_edtr_train_step`` needs no signature change.
"""

from __future__ import annotations

import math
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edtr_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
from edtr_tpu.parallel.tp import tp_spec, _path_str, _divisible

__all__ = ["fsdp_spec", "fsdp_shardings", "shard_params_fsdp",
           "fsdp_param_bytes"]

# below this, replication is cheaper than the per-step all-gather latency
DEFAULT_MIN_BYTES = 1 << 14  # 16 KiB


def fsdp_spec(
    path_str: str,
    shape: tuple,
    n_data: int,
    n_model: int = 1,
    min_bytes: int = DEFAULT_MIN_BYTES,
    itemsize: int = 4,
) -> P:
    """PartitionSpec sharding the largest free dim of one leaf over ``data``.

    Starts from the leaf's TP spec (so the two compose into a 2-D layout),
    then places ``data`` on the largest dim that is still unsharded and
    divisible by ``n_data``. Small or indivisible leaves keep the TP spec.
    """
    base = tp_spec(path_str, shape)
    if not _divisible(base, shape, n_model):
        base = P()
    if math.prod(shape or (1,)) * itemsize < min_bytes:
        return base
    axes = list(base) + [None] * (len(shape) - len(base))
    # largest-first so the gather tiles stay fat (lane-dim friendly)
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if axes[i] is None and shape[i] % n_data == 0 and shape[i] >= n_data:
            axes[i] = DATA_AXIS
            return P(*axes)
    return base


def fsdp_shardings(
    tree: Any, mesh: Mesh, min_bytes: int = DEFAULT_MIN_BYTES
) -> Any:
    """NamedSharding tree: FSDP over ``data`` composed with the TP rules."""
    n_data = mesh.shape.get(DATA_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def one(path, leaf):
        shape = getattr(leaf, "shape", ())
        itemsize = getattr(getattr(leaf, "dtype", None), "itemsize", 4)
        spec = fsdp_spec(_path_str(path), shape, n_data, n_model,
                         min_bytes, itemsize)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_params_fsdp(
    tree: Any, mesh: Mesh, min_bytes: int = DEFAULT_MIN_BYTES
) -> Any:
    """device_put a pytree onto the mesh under FSDP(+TP) placement."""
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s),
        tree,
        fsdp_shardings(tree, mesh, min_bytes),
    )


def fsdp_param_bytes(
    tree: Any, mesh: Mesh, min_bytes: int = DEFAULT_MIN_BYTES
) -> tuple:
    """(per-device bytes, total bytes) under the FSDP(+TP) rules."""
    n_data = mesh.shape.get(DATA_AXIS, 1)
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    per_dev = total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        nbytes = leaf.size * leaf.dtype.itemsize
        spec = fsdp_spec(_path_str(path), leaf.shape, n_data, n_model,
                         min_bytes, leaf.dtype.itemsize)
        total += nbytes
        div = 1
        for dim, axis in zip(leaf.shape, spec):
            if axis == DATA_AXIS:
                div *= n_data
            elif axis == MODEL_AXIS:
                div *= n_model
        per_dev += nbytes // div
    return per_dev, total
