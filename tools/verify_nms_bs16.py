#!/usr/bin/env python
"""Verify the bit-packed NMS on the real chip (round-5 VERDICT #6 gate).

The r4 detector chunked batches >8 through ``lax.map`` because the dense
(B, C-1, 1000, 1000) fp32 suppression matrices OOM-killed the v5e worker at
bs16. With the packed build (ops/boxes.py:_packed_keep) the box head runs
under PLAIN vmap at any batch. This drives the flagship VOC detector
(fasterrcnn_mobilenet_v3_large_fpn, 21 classes, 512²) on the chip:

* bs16 under plain vmap must run to completion (the old crash case),
* bs16 detect outputs must equal the 2x bs8 outputs bitwise,
* detect stage ms/img at bs8 and bs16 (chained timing).

One JSON line -> stdout. Env: EDTR_NMS_ITERS (10).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("EDTR_NMS_ITERS", "10"))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn
    from edtr_tpu.utils.benchtime import timeit_chained

    assert jax.default_backend() != "cpu", "run on the TPU chip"

    det = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21, dtype=jnp.bfloat16)
    det_vars = jax.jit(det.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 512, 512, 3)))
    x16 = jax.random.uniform(jax.random.PRNGKey(1), (16, 512, 512, 3),
                             jnp.bfloat16)

    def detect(v, im):
        d, _, _ = det.apply(v, im)
        return d

    out = {"metric": "packed-NMS bs16 verify", "iters": ITERS}

    f16 = jax.jit(detect).lower(det_vars, x16).compile()
    d16 = f16(det_vars, x16)
    jax.block_until_ready(d16)
    out["bs16_plain_vmap"] = "ran"

    f8 = jax.jit(detect).lower(det_vars, x16[:8]).compile()
    d8a = f8(det_vars, x16[:8])
    d8b = f8(det_vars, x16[8:])
    cat = {k: jnp.concatenate([d8a[k], d8b[k]], axis=0) for k in d8a}
    bitwise = all(
        bool(jnp.array_equal(cat[k], d16[k])) for k in cat)
    out["bs16_equals_2x_bs8_bitwise"] = bitwise
    if not bitwise:
        out["max_abs_diff"] = {
            k: float(jnp.max(jnp.abs(cat[k].astype(jnp.float32)
                                     - d16[k].astype(jnp.float32))))
            for k in cat}

    ms8 = timeit_chained(f8, det_vars, x16[:8].astype(jnp.bfloat16),
                         iters=ITERS) * 1e3
    ms16 = timeit_chained(f16, det_vars, x16.astype(jnp.bfloat16),
                          iters=ITERS) * 1e3
    out["detect_ms_per_img_bs8"] = round(ms8 / 8, 3)
    out["detect_ms_per_img_bs16"] = round(ms16 / 16, 3)
    out["n_detections_sample"] = int(np.asarray(d16["valid"][0]).sum())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
