"""Tensor-parallel parameter sharding over the mesh's ``model`` axis.

The reference's only parallelism is DDP data-parallel (SURVEY §2.7;
``/root/reference/main/det/train_edtr.py:35-36`` via Accelerate) — this
module is a TPU-native capability beyond reference parity: Megatron-style
column/row sharding of the transformer GEMMs in the UNet / ControlNet /
CLIP stacks, expressed purely as GSPMD placement annotations. No manual
collectives: params are ``jax.device_put`` onto ``NamedSharding``s and XLA
inserts the all-gather/reduce-scatter pairs where the annotated shardings
meet. Correctness is therefore placement-independent (GSPMD preserves
semantics for any annotation); the rules below only steer *where* the
compiler splits the FLOPs and the weight memory.

Rules (path-pattern -> PartitionSpec), the classic column/row pairing so
the activations only resolve the model axis once per block:

- attention ``to_q/to_k/to_v`` kernels: column-parallel ``P(None, "model")``
  (heads split; each shard computes its head slice of QK^T and PV).
- attention ``to_out`` kernel: row-parallel ``P("model", None)`` (consumes
  the head-sharded activation; XLA finishes with one psum). Bias replicated.
- feed-forward ``ff.proj`` (GEGLU in): column-parallel; ``ff.out``:
  row-parallel.
- ResBlock ``in_conv`` kernel (HWIO): out-channel column ``P(..., "model")``
  with ``emb_proj`` sharded to match; ``out_conv``: in-channel row
  ``P(None, None, "model", None)``. GroupNorm params between them stay
  replicated (XLA reshards around the group stats).
- everything else (norms, biases, embeddings, time MLP, zero convs,
  VAE/SwinIR/detnet params): replicated ``P()``.

On-chip note: the optional fused Pallas kernels (``EDTR_*_FUSED``) are
whole-array kernels and are not GSPMD-partitionable — run TP with the
kill-switches off (`ops/kernel_probe.py` documents them); the XLA paths
they shadow are what these rules were written for. The CPU test mesh
(`tests/test_tensor_parallel.py`) exercises exactly that configuration.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from edtr_tpu.parallel.mesh import MODEL_AXIS

__all__ = ["tp_spec", "tp_shardings", "shard_params", "tp_param_bytes"]

# path patterns are matched against "a/b/c"-joined flax param paths
_COLUMN_LAST = re.compile(
    r"(to_q|to_k|to_v)/kernel$|ff/proj/kernel$"
)
_ROW_FIRST = re.compile(r"to_out/kernel$|ff/out/kernel$")
# ResBlock conv pair (HWIO kernels) + the matching emb projection
_CONV_COL = re.compile(r"in_conv/kernel$")
_CONV_ROW = re.compile(r"out_conv/kernel$")
_EMB_COL = re.compile(r"emb_proj/kernel$")


def _path_str(path) -> str:
    parts = []
    for k in path:
        for attr in ("key", "name", "idx"):  # Dict / GetAttr / Sequence keys
            v = getattr(k, attr, None)
            if v is not None:
                parts.append(str(v))
                break
        else:
            parts.append(str(k))
    return "/".join(parts)


def tp_spec(path_str: str, shape: tuple) -> P:
    """PartitionSpec for one param leaf under the TP rules above.

    A dim is only sharded when the mesh can actually divide it — callers
    pass shapes so indivisible leaves (tiny heads, odd channels) fall back
    to replication rather than an XLA error.
    """
    if _COLUMN_LAST.search(path_str) and len(shape) == 2:
        return P(None, MODEL_AXIS)
    if _ROW_FIRST.search(path_str) and len(shape) == 2:
        return P(MODEL_AXIS, None)
    if _EMB_COL.search(path_str) and len(shape) == 2:
        return P(None, MODEL_AXIS)
    if _CONV_COL.search(path_str) and len(shape) == 4:
        return P(None, None, None, MODEL_AXIS)
    if _CONV_ROW.search(path_str) and len(shape) == 4:
        return P(None, None, MODEL_AXIS, None)
    return P()


def _divisible(spec: P, shape: tuple, n_model: int) -> bool:
    for dim, axis in zip(shape, spec):
        if axis == MODEL_AXIS and dim % n_model != 0:
            return False
    return True


def tp_shardings(tree: Any, mesh: Mesh) -> Any:
    """Map a param pytree to its NamedSharding tree under the TP rules.

    ``mesh`` must carry a ``model`` axis; with ``model=1`` every leaf is
    effectively replicated (the specs are still produced, making this safe
    to call unconditionally).
    """
    n_model = mesh.shape.get(MODEL_AXIS, 1)

    def one(path, leaf):
        spec = tp_spec(_path_str(path), getattr(leaf, "shape", ()))
        if not _divisible(spec, getattr(leaf, "shape", ()), n_model):
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, tree)


def shard_params(tree: Any, mesh: Mesh) -> Any:
    """device_put a param pytree onto the mesh per the TP rules.

    Committed placement: a subsequent ``jax.jit`` call picks these
    shardings up without explicit ``in_shardings`` — which is how
    ``make_edtr_train_step``'s state argument (sharding ``None``) accepts
    a TP-sharded model without signature changes.
    """
    return jax.tree.map(
        lambda leaf, s: jax.device_put(leaf, s), tree, tp_shardings(tree, mesh)
    )


def tp_param_bytes(tree: Any, mesh: Mesh) -> tuple:
    """(per-device bytes, replicated-everywhere bytes) — a quick audit of
    how much weight memory the rules actually split."""
    n_model = mesh.shape.get(MODEL_AXIS, 1)
    per_dev = total = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        nbytes = leaf.size * leaf.dtype.itemsize
        spec = tp_spec(_path_str(path), leaf.shape)
        total += nbytes
        sharded = _divisible(spec, leaf.shape, n_model) and any(
            a == MODEL_AXIS for a in spec
        )
        per_dev += nbytes // n_model if sharded else nbytes
    return per_dev, total
