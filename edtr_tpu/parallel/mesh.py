"""Device mesh + sharding helpers.

The reference's only parallelism is DDP data-parallel via HuggingFace
Accelerate/NCCL (SURVEY.md §2.7). The TPU-native equivalent is a 1-D
``data`` mesh over ICI: batches shard on axis 0, params replicate, and XLA
inserts the gradient all-reduce when a jitted step consumes a sharded batch
and produces replicated grads — no hand-written collectives.

A second ``model`` axis is reserved for tensor-parallel experiments (the
4096-token UNet attention shards head-wise); the reference has no TP, so
meshes default to (data=N, model=1).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None, n_model: int = 1, devices=None
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    if devs.size > 1:
        # the fused Pallas kernels are whole-array calls and not
        # GSPMD-partitionable: any multi-device mesh flips every family to
        # its XLA reference math (ops/dispatch.py; the per-module
        # _FORCE_KERNEL test hooks bypass this). Enforced here — the single
        # chokepoint every mesh user (dryrun, runner, tests) goes through.
        from edtr_tpu.ops import dispatch

        dispatch.set_multichip(True)
    return Mesh(devs, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard axis 0 across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
