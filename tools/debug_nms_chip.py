#!/usr/bin/env python
"""Bisect the packed-NMS TPU device fault (round-5 scratch tool).

verify_nms_bs16 faulted at runtime on the bs16 detect graph. Stages:
  1. standalone packed nms_mask, single call (N=1000)
  2. vmapped (20 classes) packed nms_mask
  3. doubly-vmapped (16, 20) packed nms_mask  — the box-head shape
  4. detect bs2 / bs8 / bs16 full graph
Prints one line per stage; first fault localizes the bug.
"""

import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = os.environ.get("EDTR_NMS_DEBUG_STAGES", "1,2,3,4a,4b,4c").split(",")


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from edtr_tpu.ops import boxes as B

    g = np.random.default_rng(0)

    def mk(shape_prefix, n=1000):
        centers = g.random(shape_prefix + (n, 2)).astype(np.float32) * 400
        wh = g.random(shape_prefix + (n, 2)).astype(np.float32) * 80 + 4
        boxes = np.concatenate([centers, centers + wh], axis=-1)
        scores = g.random(shape_prefix + (n,)).astype(np.float32)
        valid = g.random(shape_prefix + (n,)) > 0.05
        return jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(valid)

    if "1" in STAGES:
        b, s, v = mk(())
        out = jax.jit(lambda b, s, v: B.nms_mask(b, s, 0.5, v))(b, s, v)
        jax.block_until_ready(out)
        print("stage1 single packed nms: ok", int(out.sum()), flush=True)

    if "2" in STAGES:
        b, s, v = mk((20,))
        out = jax.jit(jax.vmap(lambda b, s, v: B.nms_mask(b, s, 0.5, v)))(
            b, s, v)
        jax.block_until_ready(out)
        print("stage2 vmap20: ok", int(out.sum()), flush=True)

    if "3" in STAGES:
        b, s, v = mk((16, 20))
        out = jax.jit(jax.vmap(jax.vmap(
            lambda b, s, v: B.nms_mask(b, s, 0.5, v))))(b, s, v)
        jax.block_until_ready(out)
        print("stage3 vmap16x20: ok", int(out.sum()), flush=True)

    if any(s.startswith("4") for s in STAGES):
        from edtr_tpu.models.faster_rcnn import (
            fasterrcnn_mobilenet_v3_large_fpn)

        det = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21,
                                                dtype=jnp.bfloat16)
        det_vars = jax.jit(det.init)(
            {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 512, 512, 3)))

        def detect(v, im):
            d, _, _ = det.apply(v, im)
            return d

        for tag, bs in [("4a", 2), ("4b", 8), ("4c", 16)]:
            if tag not in STAGES:
                continue
            x = jax.random.uniform(jax.random.PRNGKey(1),
                                   (bs, 512, 512, 3), jnp.bfloat16)
            f = jax.jit(detect).lower(det_vars, x).compile()
            d = f(det_vars, x)
            jax.block_until_ready(d)
            print(f"stage{tag} detect bs{bs}: ok",
                  int(np.asarray(d["valid"]).sum()), flush=True)


if __name__ == "__main__":
    main()
