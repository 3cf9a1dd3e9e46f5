"""Benchmark: EDTR-s4 512x512 restore+detect throughput on one TPU chip.

Measures the flagship end-to-end graph — SwinIR pre-restoration +
ControlNet+UNet 4-step spaced denoise as one lax.scan + VAE decode + wavelet
color fix + Faster R-CNN (mobilenet-FPN) detection — at SD2.1 scale, bf16
compute, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline: the reference publishes no throughput numbers (BASELINE.md).
``A6000_BASELINE_IMG_S`` is a documented engineering estimate of the PyTorch
reference at bs=1 fp16 on an A6000 (4 x (UNet ~70ms + ControlNet ~35ms)
+ VAE decode ~90ms + SwinIR ~110ms + detnet ~25ms ~= 645ms/img -> ~1.55
img/s); ``vs_baseline`` is measured_throughput / that estimate. The
north-star is >=3x (BASELINE.json).

Env knobs: EDTR_BENCH_BATCH (4), EDTR_BENCH_ITERS (10),
EDTR_BENCH_DETNET=0 to drop the detector from the graph.
"""

import json
import os
import time

os.environ.setdefault("EDTR_ENTRY_SIZE", "full")

A6000_BASELINE_IMG_S = 1.55
BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
ITERS = int(os.environ.get("EDTR_BENCH_ITERS", "10"))
WITH_DETNET = os.environ.get("EDTR_BENCH_DETNET", "1") == "1"
# fuse restore+detect into ONE executable (single dispatch/iter); falls back
# to two executables automatically if the fused graph fails to fit/compile
FUSED = os.environ.get("EDTR_BENCH_FUSED", "0") == "1"


def main() -> None:
    from edtr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    import __graft_entry__ as G

    tiny = jax.default_backend() == "cpu"
    image_size = 64 if tiny else 512
    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=tiny)
    params = G._init_params(pipe, jax.random.PRNGKey(0), image_size)
    # inference bench: bf16 params halve HBM (fp32 masters are a training
    # concern; modules upcast norms/softmax internally regardless)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    c_txt = jnp.zeros(
        (BATCH, pipe.cldm.clip.context_length, pipe.cldm.clip.width), jnp.float32
    )

    detnet = det_vars = None
    if WITH_DETNET and not tiny:
        from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn

        detnet = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21, dtype=jnp.bfloat16)
        det_vars = jax.jit(detnet.init)(
            {"params": jax.random.PRNGKey(7)},
            jnp.zeros((BATCH, image_size, image_size, 3)),
        )

    # two executables (restore | detect), timed back-to-back: a single fused
    # graph's buffer assignment exceeds HBM (restore holds scan state while
    # the detector's buffers are live); sequential executables share the chip
    # with restore temps freed between dispatches.
    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, image_size, image_size, 3))
    rng = jax.random.PRNGKey(231)

    # explicit lower+compile so the SAME executable yields both the timing
    # and XLA's cost analysis (for the MFU line) without a second compile
    def _flops(compiled):
        try:
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0] if cost else {}
            return float(cost.get("flops", 0.0))
        except Exception:
            return 0.0

    if FUSED and detnet is not None:
        def fused(p, dv, prev, rng):
            lq_in = jnp.clip(prev, 0, 1).astype(jnp.float32)
            restored = pipe.restore(p, lq_in, rng, c_txt=c_txt)["restored"]
            scores = detnet.apply(dv, restored)[0]["scores"]
            # recycle in bf16: the executable is compiled for a bf16 prev
            return restored.astype(jnp.bfloat16), scores

        prev0 = lq.astype(jnp.bfloat16)
        try:
            fused_fn = jax.jit(fused).lower(params, det_vars, prev0, rng).compile()
            out, scores = fused_fn(params, det_vars, prev0, rng)
            jax.block_until_ready((out, scores))
            total_flops = _flops(fused_fn)
            t0 = time.time()
            for i in range(ITERS):
                out, scores = fused_fn(params, det_vars, out,
                                       jax.random.fold_in(rng, i))
            sink = float(out.astype(jnp.float32).mean())
            sink += float(scores.astype(jnp.float32).mean())
            dt = (time.time() - t0) / ITERS
            _report(dt, total_flops, detnet, image_size)
            return
        except Exception as e:
            import sys

            print(f"# fused graph fell back: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    restore_fn = jax.jit(
        lambda p, lq, rng: pipe.restore(p, lq, rng, c_txt=c_txt)["restored"]
    ).lower(params, lq, rng).compile()

    out = restore_fn(params, lq, rng)
    out.block_until_ready()
    # IMPORTANT warm-up protocol: the loop feeds the restore output (bf16)
    # into the detector and recycles it (cast back to f32) as the next lq —
    # compile both executables for EXACTLY those dtypes so no compile ever
    # lands inside the timed region (r1 measured 6.49 after claiming 7.34
    # because a silent jit recompile was amortized into the loop).
    detect_fn = None
    if detnet is not None:
        try:
            detect_fn = jax.jit(
                lambda dv, x: detnet.apply(dv, x)[0]["scores"]
            ).lower(det_vars, out).compile()
            detect_fn(det_vars, out).block_until_ready()
        except Exception as e:
            import sys

            print(f"# detect stage dropped: {type(e).__name__}", file=sys.stderr, flush=True)
            detnet = det_vars = detect_fn = None
    total_flops = _flops(restore_fn) + (_flops(detect_fn) if detect_fn else 0.0)

    nxt = jnp.clip(out, 0, 1).astype(jnp.float32)
    out = restore_fn(params, nxt, rng)  # warm the steady-state input path
    if detect_fn is not None:
        detect_fn(det_vars, out).block_until_ready()
    else:
        out.block_until_ready()

    t0 = time.time()
    for i in range(ITERS):
        out = restore_fn(params, jnp.clip(out, 0, 1).astype(jnp.float32),
                         jax.random.fold_in(rng, i))
        if detect_fn is not None:
            scores = detect_fn(det_vars, out)
    # force full materialization: on the axon tunnel, block_until_ready can
    # return before queued work completes; a host read cannot
    sink = float(out.astype(jnp.float32).mean())
    if detect_fn is not None:
        sink += float(scores.astype(jnp.float32).mean())
    dt = (time.time() - t0) / ITERS

    _report(dt, total_flops, detnet, image_size)


def _report(dt, total_flops, detnet, image_size):
    import jax
    import json

    img_s = BATCH / dt
    stages = "SwinIR + 4-step ControlNet/UNet scan + VAE decode + wavelet" + (
        " + FasterRCNN-mobilenet-FPN detect" if detnet is not None else ""
    )
    # model FLOPs utilization: XLA cost-analysis flops of the executables
    # over measured wall-clock, vs the chip's bf16 peak
    kind = jax.devices()[0].device_kind.lower()
    peak = 197e12 if ("v5 lite" in kind or "v5e" in kind) else (
        459e12 if "v5p" in kind else 275e12 if "v4" in kind else 197e12)
    mfu = (total_flops / dt) / peak if total_flops > 0 else -1.0
    print(
        json.dumps(
            {
                "metric": f"EDTR-s4 {image_size}x{image_size} restore ({stages}), bs={BATCH}, bf16",
                "value": round(img_s, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / A6000_BASELINE_IMG_S, 3),
                "mfu": round(mfu, 4),
                "tflops_per_img": round(total_flops / BATCH / 1e12, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
