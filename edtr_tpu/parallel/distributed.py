"""Multi-process launch wiring (the reference's ``accelerate launch`` analog).

The reference starts N processes via ``accelerate launch`` with
``CUDA_VISIBLE_DEVICES`` lists (``/root/reference/script.sh:26,42``); each
process DDP-wraps its models over NCCL. The JAX-native equivalent is
``jax.distributed.initialize``: every process connects to a coordinator,
``jax.devices()`` then spans ALL processes' chips, and the same 1-D ``data``
mesh (``edtr_tpu.parallel.mesh``) laid over the global device list makes the
jitted train step's gradient psum ride ICI/DCN with zero code changes —
the per-host batch shards are placed on local devices by
``make_array_from_process_local_data``.

Launch contract (mirrors ``jax.distributed`` conventions):

    EDTR_COORDINATOR=host:port EDTR_NUM_PROCESSES=N EDTR_PROCESS_ID=i \
        python main/det/train_edtr.py --config ...

or the standard JAX env vars (``JAX_COORDINATOR_ADDRESS`` etc.) / managed
TPU-pod metadata, in which case ``jax.distributed.initialize()`` is called
with no arguments and autodetects. Single-process runs are the default —
no env vars, no-op.

The host-side COCO-evaluator object merge
(``edtr_tpu.utils.coco_eval.CocoEvaluator.synchronize_between_processes``,
reference ``utils/detection.py:631-644``) picks the multihost branch
automatically once ``jax.process_count() > 1``; it is covered by the real
2-process CPU test in ``tests/test_multiprocess.py``.
"""

from __future__ import annotations

import os
from typing import Optional


def maybe_initialize_distributed() -> bool:
    """Env-gated ``jax.distributed.initialize``; returns True if multi-process.

    Safe to call multiple times (subsequent calls are no-ops) and safe in
    single-process runs (returns False without touching the JAX runtime).
    """
    import jax

    coordinator = os.environ.get(
        "EDTR_COORDINATOR", os.environ.get("JAX_COORDINATOR_ADDRESS")
    )
    nproc = os.environ.get(
        "EDTR_NUM_PROCESSES", os.environ.get("JAX_NUM_PROCESSES")
    )
    pid = os.environ.get("EDTR_PROCESS_ID", os.environ.get("JAX_PROCESS_ID"))
    if coordinator is None and nproc is None:
        return False
    try:
        already = jax._src.distributed.global_state.client is not None
    except Exception:
        already = False
    if not already:
        if coordinator is not None and nproc is not None and pid is not None:
            jax.distributed.initialize(
                coordinator_address=coordinator,
                num_processes=int(nproc),
                process_id=int(pid),
            )
        else:
            # managed environments (TPU pods): full autodetection
            jax.distributed.initialize()
    return jax.process_count() > 1


def global_mesh(n_model: int = 1):
    """1-D data mesh over the GLOBAL device list (all processes)."""
    import jax

    from edtr_tpu.parallel.mesh import make_mesh

    return make_mesh(
        len(jax.devices()) // n_model, n_model, devices=jax.devices()
    )


def shard_host_batch(batch, mesh):
    """Place a per-process host batch into a globally-sharded jax.Array.

    Every process passes ITS slice of the global batch (the per-host loader
    sharding from ``train/harness.py``); the result is one global array
    sharded batch-major over the ``data`` axis, ready for the jitted step.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, x), batch
    )
