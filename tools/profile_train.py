#!/usr/bin/env python
"""Train-step profile: remat policy A/B + flash-backward engagement.

VERDICT r4 next #4: the r4 inference side got a stage A/B + internals
profile; the backward got nothing. This measures, on the real chip:

1. ``policies`` — full EDTR train step (global bs EDTR_TRAIN_BENCH_BATCH,
   accum EDTR_TRAIN_BENCH_ACCUM) per $EDTR_REMAT_POLICY in
   EDTR_TRAIN_POLICIES (default "full,dots"): s/step + img/s. 'dots' saves
   matmul/conv outputs in the remat'd blocks and recomputes only
   elementwise/norms (models/layers.py:remat).
2. ``flash_bwd`` — proof the Pallas flash-attention backward engages under
   nn.remat: compile grad of a remat'd flagship-shape attention block and
   count Mosaic custom calls in forward vs backward HLO. Under remat the
   backward must contain the re-played forward kernels AND the dq/dkv
   kernels (ops/flash_attention.py:_flash_bwd_flat).
3. ``halves`` — the EDTR (HLF) half alone: forward loss vs
   value_and_grad at the real microbatch, isolating the backward's cost.

One JSON line. Env: EDTR_TRAIN_BENCH_BATCH (16), EDTR_TRAIN_BENCH_ACCUM
(8), EDTR_TRAIN_POLICIES, EDTR_PROF_ITERS (3).
Ref: /root/reference/main/det/train_edtr.py:160-250, model/util.py:35-95.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("EDTR_TRAIN_BENCH_BATCH", "16"))
ACCUM = int(os.environ.get("EDTR_TRAIN_BENCH_ACCUM", "8"))
ITERS = int(os.environ.get("EDTR_PROF_ITERS", "3"))
POLICIES = os.environ.get("EDTR_TRAIN_POLICIES", "full,dots").split(",")
SIZE = 512


def main():
    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G
    from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn
    from edtr_tpu.train.edtr_step import (EDTRTrainState, cast_frozen_bf16,
                                          make_edtr_train_step,
                                          merge_params, split_trainable)
    from edtr_tpu.utils.benchtime import timeit_chained
    from edtr_tpu.utils.image import wavelet_reconstruction

    out = {"metric": "train profile", "global_batch": BATCH, "accum": ACCUM}
    # crash resilience (r5: a relay outage at minute 74 killed the first
    # full run with every section unprinted): sections are selectable via
    # EDTR_TRAIN_SECTIONS and the partial JSON is re-printed after each
    # one — consumers take the LAST matching line.
    sections = set(os.environ.get(
        "EDTR_TRAIN_SECTIONS", "flash_bwd,halves,policies").split(","))

    # ---- 2. flash backward engages under remat -----------------------------
    from flax import linen as nn

    from edtr_tpu.models.attention import BasicTransformerBlock

    blk = BasicTransformerBlock(dim=320, n_heads=5, d_head=64,
                                context_dim=1024, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4096, 320), jnp.bfloat16)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 77, 1024), jnp.bfloat16)
    v = jax.jit(blk.init)(jax.random.PRNGKey(2), x, ctx)

    RB = nn.remat(BasicTransformerBlock)

    def fwd(v, x):
        return RB(dim=320, n_heads=5, d_head=64, context_dim=1024,
                  dtype=jnp.bfloat16).apply(v, x, ctx).astype(
                      jnp.float32).mean()

    def count_mosaic(compiled):
        txt = compiled.as_text()
        return txt.count("tpu_custom_call")

    if "flash_bwd" in sections:
        c_fwd = jax.jit(fwd).lower(v, x).compile()
        c_bwd = jax.jit(jax.grad(fwd, argnums=1)).lower(v, x).compile()
        n_fwd, n_bwd = count_mosaic(c_fwd), count_mosaic(c_bwd)
        out["flash_bwd"] = {
            "mosaic_calls_fwd": n_fwd,
            "mosaic_calls_bwd": n_bwd,
            # remat replays the fwd kernel(s) and adds dq + dkv kernels
            "pallas_bwd_engaged": n_bwd >= n_fwd + 2,
        }
        print(json.dumps(out), flush=True)
    if not sections & {"halves", "policies"}:
        return

    # ---- setup shared train state ------------------------------------------
    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=False, train=True)
    params = G._init_params(pipe, jax.random.PRNGKey(0), SIZE)
    detnet = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21,
                                               dtype=jnp.bfloat16)
    det_vars = jax.jit(detnet.init)(
        {"params": jax.random.PRNGKey(7)}, jnp.zeros((1, SIZE, SIZE, 3)))
    params["detnet"] = det_vars
    params["teacher_detnet"] = jax.tree.map(jnp.copy, det_vars)
    params = cast_frozen_bf16(params, train_decoder=True)

    g = 8
    batch = {
        "lq": jax.random.uniform(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3)),
        "gt": jax.random.uniform(jax.random.PRNGKey(2), (BATCH, SIZE, SIZE, 3)),
        "c_txt": jnp.zeros(
            (BATCH, pipe.cldm.clip.context_length, pipe.cldm.clip.width),
            jnp.float32),
        "targets": {
            "boxes": jnp.concatenate([
                jax.random.uniform(jax.random.PRNGKey(3), (BATCH, g, 2)) * 400,
                jax.random.uniform(jax.random.PRNGKey(3), (BATCH, g, 2)) * 400
                + jnp.asarray([40.0, 40.0])], axis=-1),
            "labels": jax.random.randint(jax.random.PRNGKey(5), (BATCH, g),
                                         1, 21),
            "valid": jnp.ones((BATCH, g), bool),
        },
    }
    rng = jax.random.PRNGKey(231)

    # ---- 3. EDTR (HLF) half: fwd vs grad at the real microbatch ------------
    micro = max(BATCH // ACCUM, 1)
    mb = {k: (jax.tree.map(lambda a: a[:micro], v) if k != "targets"
              else jax.tree.map(lambda a: a[:micro], v))
          for k, v in batch.items()}
    pre = jax.jit(pipe.pre_restore)(params, mb["lq"])
    z_pre = jax.jit(
        lambda p, x: pipe.cldm.vae_encode(p, x * 2 - 1, sample=False)
    )(params, pre)
    cond = dict(c_txt=mb["c_txt"], c_img=z_pre)
    trainable, frozen = split_trainable(params, True)
    t_fix = jnp.full((micro,), 150, jnp.int32)

    def hlf_loss(tr, z_pre):
        p = merge_params(tr, frozen)
        o = pipe.diffusion.reverse(pipe.cldm.model_fn(p), t_fix, z_pre, cond,
                                   rng=rng)
        decoded = (pipe.cldm.vae_decode(p, o["x_pred"]) + 1) / 2
        res = wavelet_reconstruction(decoded, pre)
        return jnp.abs(res - mb["gt"]).mean()

    if "halves" in sections:
        f_fwd = jax.jit(hlf_loss).lower(trainable, z_pre).compile()
        f_grad = jax.jit(jax.grad(hlf_loss)).lower(trainable, z_pre).compile()
        ms_f = timeit_chained(f_fwd, trainable, z_pre, iters=5) * 1e3
        ms_g = timeit_chained(f_grad, trainable, z_pre, iters=5) * 1e3
        out["halves"] = {
            "hlf_fwd_ms": round(ms_f, 1),
            "hlf_grad_ms": round(ms_g, 1),
            "bwd_over_fwd": round(ms_g / ms_f, 2),
            "micro_batch": micro,
        }
        print(json.dumps(out), flush=True)

    # ---- 1. remat policy A/B on the full step -------------------------------
    policies = {}
    for pol in (POLICIES if "policies" in sections else []):
        os.environ["EDTR_REMAT_POLICY"] = pol
        step = make_edtr_train_step(pipe, detnet=detnet, accum_steps=ACCUM,
                                    jit=False)
        state = EDTRTrainState.create(pipe, jax.tree.map(jnp.copy, params))
        t0 = time.time()
        try:
            compiled = jax.jit(step, donate_argnums=(0,)).lower(
                state, batch, rng).compile()
        except Exception as e:  # noqa: BLE001 — OOM at compile is a result
            policies[pol] = {"error": str(e)[:200]}
            continue
        t_c = time.time() - t0
        try:
            st = state
            t0 = time.time()
            for i in range(ITERS):
                st, m = compiled(st, batch, rng)
            jax.block_until_ready(jax.tree.leaves(m))
            s_step = (time.time() - t0) / ITERS
            policies[pol] = {
                "compile_s": round(t_c, 1),
                "s_per_step": round(s_step, 3),
                "img_per_s_per_chip": round(BATCH / s_step, 3),
            }
        except Exception as e:  # noqa: BLE001 — runtime OOM is a result
            policies[pol] = {"compile_s": round(t_c, 1),
                             "error": str(e)[:200]}
    os.environ.pop("EDTR_REMAT_POLICY", None)
    out["policies"] = policies
    print(json.dumps(out))


if __name__ == "__main__":
    main()
