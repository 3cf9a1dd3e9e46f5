#!/usr/bin/env python
"""Detect-stage attribution profile (round 5; BENCH_r04: 4.32 ms/img,
MFU 0.049 — VERDICT r4 next #6 wants detect <= 3 ms/img or a measured
account of where the time goes).

The FasterRCNN graph is one executable, so attribution is by knob
variants — each rebuilds the detector with ONE cost source removed and
times the full bench-identical dispatch (bs8, 512^2 bf16 input):

  full      — bench detnet (mobilenet-FPN, 21 classes, min_size 800,
              1000 post-NMS proposals): the baseline
  dense_nms — NMS_CHUNK raised so the box head runs the r4 dense (N,N)
              formulation instead of the bit-packed build (prices the
              round-5 packed-NMS change at bs8)
  min512    — min_size/max_size 512: no 800-px resize, backbone/FPN/RPN
              at 512^2 (prices the transform + backbone scale)
  props100  — rpn_post_nms_top_n_test 100 (vs 1000): prices everything
              downstream of proposal count (RoIAlign, box head, the
              (C-1)xN=1000 per-class NMS)
  cls2      — num_classes=2: prices the 20-way per-class NMS vmap
  pre16     — rpn_pre_nms_top_n_test 16: guts RPN NMS + downstream;
              what remains ~= transform + backbone + FPN + RPN head

Differences full-minus-variant attribute ms to each source (overlaps
noted in the JSON). One JSON line to stdout.
Ref: /root/reference/model/faster_rcnn.py:1011-1440 (eval path).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(os.environ.get("EDTR_PROF_ITERS", "20"))
BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
SIZE = int(os.environ.get("EDTR_PROFILE_SIZE", "512"))


def main():
    import jax
    import jax.numpy as jnp

    from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn
    from edtr_tpu.ops import boxes as boxes_mod
    from edtr_tpu.utils.benchtime import timeit_chained as tc

    x = jax.random.uniform(
        jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3)).astype(jnp.bfloat16)

    variants = {
        "full": {},
        "dense_nms": {},  # same net; NMS_CHUNK monkeypatched below
        "min512": dict(min_size=512, max_size=512),
        "props100": dict(rpn_post_nms_top_n_test=100),
        "cls2": dict(num_classes=2),
        "cap200": dict(box_pre_nms_top_n=200),  # per-class candidate cap
        "pre16": dict(rpn_pre_nms_top_n_test=16),
    }

    out = {"batch": BATCH, "iters": ITERS, "size": SIZE, "variants": {}}
    for name, kw in variants.items():
        old_chunk = boxes_mod.NMS_CHUNK
        try:
            if name == "dense_nms":
                boxes_mod.NMS_CHUNK = 4096  # force the dense (N,N) path
            net = fasterrcnn_mobilenet_v3_large_fpn(
                num_classes=kw.pop("num_classes", 21),
                dtype=jnp.bfloat16, **kw)
            dv = jax.jit(net.init)({"params": jax.random.PRNGKey(7)},
                                   x[:1].astype(jnp.float32))
            t0 = time.time()
            ex = jax.jit(
                lambda v, im: net.apply(v, im)[0]["scores"]
            ).lower(dv, x).compile()
            compile_s = time.time() - t0
            jax.block_until_ready(ex(dv, x))
            ms = tc(ex, dv, x, iters=ITERS) * 1e3 / BATCH
            out["variants"][name] = {"ms_per_img": round(ms, 3),
                                     "compile_s": round(compile_s, 1)}
            print(f"detect [{name}]: {ms:.3f} ms/img "
                  f"(compile {compile_s:.0f}s)", file=sys.stderr, flush=True)
        except Exception as e:  # keep profiling the rest
            out["variants"][name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"detect [{name}]: FAILED {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
        finally:
            boxes_mod.NMS_CHUNK = old_chunk

    v = out["variants"]
    if all("ms_per_img" in v.get(k, {}) for k in
           ("full", "min512", "props100", "cls2", "pre16")):
        f = v["full"]["ms_per_img"]
        out["attribution_ms_per_img"] = {
            "resize_800_and_backbone_scale": round(f - v["min512"]["ms_per_img"], 3),
            "proposal_count_1000_vs_100": round(f - v["props100"]["ms_per_img"], 3),
            "per_class_nms_20way": round(f - v["cls2"]["ms_per_img"], 3),
            "transform_backbone_fpn_rpnhead_approx": v["pre16"]["ms_per_img"],
            "note": "overlapping attributions; do not sum",
        }
    print(json.dumps({"metric": "detect attribution profile", **out}))


if __name__ == "__main__":
    main()
