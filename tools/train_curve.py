#!/usr/bin/env python
"""100-step real-shape flagship train run: archive the loss curves.

VERDICT r4 "what's missing" #1 / next #3b: no artifact anywhere showed a
loss DECREASING over steps. This runs the full two-optimizer EDTR step at
SD2.1 scale (512², global bs 16 as accum 8x2 — the VOC flagship recipe
semantics, configs/det/voc2012/train/007_edtr-s4.yaml:159-161) for
EDTR_CURVE_STEPS steps on ONE fixed batch with a FIXED per-step rng
(deterministic overfit objective), recording every loss each step:

  loss_hlf                              (EDTR half, feature-matching HLF)
  loss_det, loss_fm                     (detnet half)
  loss_objectness, loss_rpn_box_reg,
  loss_classifier, loss_box_reg         (detector components)

Random-init caveat (no SD weights on this machine): the UNet's zero-init
out_conv is given weight so eps-gradients flow (same proxy the CPU
convergence tests use), and "converges" here means the optimization
machinery descends the real-shape objective — metric-level convergence
needs the real checkpoints (tools/parity_run.py, environment-blocked).

One JSON line with the full curves -> stdout
(tee to results/chip_queue/train_curve.json).
Env: EDTR_CURVE_STEPS (100), EDTR_CURVE_BATCH (16), EDTR_CURVE_ACCUM (8),
EDTR_CURVE_SIZE (512).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = int(os.environ.get("EDTR_CURVE_STEPS", "100"))
BATCH = int(os.environ.get("EDTR_CURVE_BATCH", "16"))
ACCUM = int(os.environ.get("EDTR_CURVE_ACCUM", "8"))
SIZE = int(os.environ.get("EDTR_CURVE_SIZE", "512"))
# loss weights (reference defaults). The 100-step full-recipe run showed
# loss_det descending 4.08 -> 0.53 while loss_hlf ROSE: the det half's
# gradient flows into the restore path by design (task-driven restoration,
# main/det/train_edtr.py:203-241), and with this tool's SYNTHETIC random
# boxes "detection-friendly" pulls the image away from gt. W_DET=0 W_FM=0
# isolates the stationary frozen-teacher HLF objective at real shape.
W_DET = float(os.environ.get("EDTR_CURVE_W_DET", "1.0"))
W_FM = float(os.environ.get("EDTR_CURVE_W_FM", "0.2"))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn
    from edtr_tpu.train.edtr_step import (EDTRTrainState, cast_frozen_bf16,
                                          make_edtr_train_step)

    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=False, train=True)
    params = G._init_params(pipe, jax.random.PRNGKey(0), SIZE)
    # zero-init out_conv blocks every eps gradient at random init; give it
    # weight like a loaded SD checkpoint would
    params["unet"]["out_conv"]["kernel"] = (
        jax.random.normal(jax.random.PRNGKey(9),
                          params["unet"]["out_conv"]["kernel"].shape,
                          params["unet"]["out_conv"]["kernel"].dtype) * 0.05)

    detnet = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21,
                                               dtype=jnp.bfloat16)
    det_vars = jax.jit(detnet.init)(
        {"params": jax.random.PRNGKey(7)}, jnp.zeros((1, SIZE, SIZE, 3)))
    params["detnet"] = det_vars
    params["teacher_detnet"] = jax.tree.map(jnp.copy, det_vars)
    params = cast_frozen_bf16(params, train_decoder=True)

    state = EDTRTrainState.create(pipe, params, train_steps=STEPS)
    step = make_edtr_train_step(pipe, detnet=detnet, accum_steps=ACCUM,
                                weight_det=W_DET, weight_fm=W_FM, jit=False)

    g = 8
    if os.environ.get("EDTR_CURVE_GT", "noise") == "struct":
        # Structured gt + strong degradation: the W_DET=0 HLF isolation on
        # UNIFORM-NOISE gt is degenerate — a random-init frozen teacher
        # maps noise images to near-identical features, so loss_hlf starts
        # ~3e-4 with nothing to descend (train_curve_hlf.json, round 5).
        # Smooth multi-scale patterns give differentiated teacher features;
        # heavy blur+noise degradation makes HLF start high.
        yy, xx = jnp.meshgrid(jnp.linspace(0, 1, SIZE),
                              jnp.linspace(0, 1, SIZE), indexing="ij")
        ph = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, 3, 4)) * 6.28
        fr = jax.random.uniform(jax.random.PRNGKey(6), (BATCH, 3, 4)) * 30 + 3
        gt = jnp.clip(0.5 + 0.25 * sum(
            jnp.sin(fr[:, :, None, None, k] * (xx if k % 2 else yy)
                    [None, None] + ph[:, :, None, None, k])
            for k in range(4)).transpose(0, 2, 3, 1), 0.0, 1.0)
        blur = gt
        for _ in range(3):  # cheap separable-ish blur via avg pooling
            blur = jax.lax.reduce_window(
                blur, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
                "SAME") / 25.0
        lq = jnp.clip(blur + 0.15 * jax.random.normal(
            jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3)), 0.0, 1.0)
    else:
        gt = jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3))
        lq = jnp.clip(gt + 0.08 * jax.random.normal(
            jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3)), 0.0, 1.0)
    bx = jax.random.uniform(jax.random.PRNGKey(3), (BATCH, g, 2)) * (SIZE - 96)
    wh = jax.random.uniform(jax.random.PRNGKey(4), (BATCH, g, 2)) * 80 + 16
    batch = {
        "lq": lq, "gt": gt,
        "c_txt": jnp.zeros(
            (BATCH, pipe.cldm.clip.context_length, pipe.cldm.clip.width),
            jnp.float32),
        "targets": {
            "boxes": jnp.concatenate([bx, bx + wh], axis=-1),
            "labels": jax.random.randint(jax.random.PRNGKey(5), (BATCH, g),
                                         1, 21),
            "valid": jnp.ones((BATCH, g), bool),
        },
    }

    t0 = time.time()
    compiled = jax.jit(step, donate_argnums=(0,)).lower(
        state, batch, jax.random.PRNGKey(231)).compile()
    t_compile = time.time() - t0

    rng = jax.random.PRNGKey(231)  # FIXED every step: deterministic objective
    curves = {}
    t0 = time.time()
    for i in range(STEPS):
        state, metrics = compiled(state, batch, rng)
        for k, v in metrics.items():
            curves.setdefault(k, []).append(
                round(float(jnp.asarray(v).astype(jnp.float32)), 6))
    wall = time.time() - t0

    def quarter(name):
        s = curves.get(name, [])
        q = max(len(s) // 4, 1)
        return (round(float(np.mean(s[:q])), 6),
                round(float(np.mean(s[-q:])), 6))

    summary = {k: {"first_q": quarter(k)[0], "last_q": quarter(k)[1],
                   "decreased": quarter(k)[1] < quarter(k)[0]}
               for k in sorted(curves)}
    finite = all(np.isfinite(np.asarray(s)).all() for s in curves.values())
    print(json.dumps({
        "metric": "flagship 512^2 train loss curves",
        "steps": STEPS, "global_batch": BATCH, "accum": ACCUM,
        "weight_det": W_DET, "weight_fm": W_FM,
        "compile_s": round(t_compile, 1),
        "s_per_step": round(wall / STEPS, 3),
        "img_per_s_per_chip": round(BATCH * STEPS / wall, 3),
        "all_finite": finite,
        "summary": summary,
        "curves": curves,
    }))


if __name__ == "__main__":
    main()
