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
    restore_fn = jax.jit(
        lambda p, lq, rng: pipe.restore(p, lq, rng, c_txt=c_txt)["restored"]
    )
    detect_fn = (
        jax.jit(lambda dv, x: detnet.apply(dv, x)[0]["scores"])
        if detnet is not None
        else None
    )
    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, image_size, image_size, 3))
    rng = jax.random.PRNGKey(231)

    out = restore_fn(params, lq, rng)
    out.block_until_ready()
    if detect_fn is not None:
        try:
            detect_fn(det_vars, out).block_until_ready()
        except Exception as e:
            import sys

            print(f"# detect stage dropped: {type(e).__name__}", file=sys.stderr, flush=True)
            detnet = det_vars = detect_fn = None

    t0 = time.time()
    for i in range(ITERS):
        out = restore_fn(params, jnp.clip(out, 0, 1), jax.random.fold_in(rng, i))
        if detect_fn is not None:
            scores = detect_fn(det_vars, out)
    # force full materialization: on the axon tunnel, block_until_ready can
    # return before queued work completes; a host read cannot
    sink = float(out.astype(jnp.float32).mean())
    if detect_fn is not None:
        sink += float(scores.astype(jnp.float32).mean())
    dt = (time.time() - t0) / ITERS

    img_s = BATCH / dt
    stages = "SwinIR + 4-step ControlNet/UNet scan + VAE decode + wavelet" + (
        " + FasterRCNN-mobilenet-FPN detect" if detnet is not None else ""
    )
    print(
        json.dumps(
            {
                "metric": f"EDTR-s4 {image_size}x{image_size} restore ({stages}), bs={BATCH}, bf16",
                "value": round(img_s, 3),
                "unit": "images/sec/chip",
                "vs_baseline": round(img_s / A6000_BASELINE_IMG_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
