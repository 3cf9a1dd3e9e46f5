"""Benchmark: EDTR-s4 512x512 restore+detect throughput on one TPU chip.

Measures the flagship end-to-end graph — SwinIR pre-restoration +
ControlNet+UNet 4-step spaced denoise as one lax.scan + VAE decode + wavelet
color fix + Faster R-CNN (mobilenet-FPN) detection — at SD2.1 scale, bf16
compute, and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N,
     "mfu": ..., "stages_ms_per_img": {...}}

Baseline: the reference publishes no throughput numbers (BASELINE.md).
``A6000_BASELINE_IMG_S`` is a documented engineering *estimate* of the
PyTorch reference at bs=1 fp16 on an A6000 (4 x (UNet ~70ms + ControlNet
~35ms) + VAE decode ~90ms + SwinIR ~110ms + detnet ~25ms ~= 645ms/img ->
~1.55 img/s); ``vs_baseline`` is measured_throughput / that estimate. The
north-star is >=3x (BASELINE.json).

Timed-loop hygiene (VERDICT r2 weak #1): the steady-state loop performs
EXACTLY two dispatches per iteration (restore, detect) — the output-recycle
clip/cast lives INSIDE the restore executable, so no eager per-op tunnel
round-trips sit in the timed region, and both executables are compiled
ahead of the loop for the exact steady-state dtypes. The per-stage
breakdown (same stage split as tools/profile_stages.py) is measured with
separately compiled stage executables afterwards so a driver-vs-local delta
is localizable from the artifact alone.

Env knobs: EDTR_BENCH_BATCH (8), EDTR_BENCH_ITERS (10),
EDTR_BENCH_DETNET=0 to drop the detector, EDTR_BENCH_STAGES=0 to skip the
per-stage pass, EDTR_BENCH_FUSED=1 to fuse restore+detect into one
executable (measured slower in r2; kept as a knob), EDTR_BENCH_SPLIT to
control the stage-wise executable pipeline (default on: swinir | encode |
denoise-scan | decode+wavelet | detect as five executables — dispatch RTT
is ~0.01 ms while the monolithic executable measured ~14 ms/img slower
than its stage sum, an XLA buffer-pressure effect; =0 forces the single
restore executable).
"""

import json
import os
import time

os.environ.setdefault("EDTR_ENTRY_SIZE", "full")

A6000_BASELINE_IMG_S = 1.55
BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "8"))
ITERS = int(os.environ.get("EDTR_BENCH_ITERS", "10"))
WITH_DETNET = os.environ.get("EDTR_BENCH_DETNET", "1") == "1"
WITH_STAGES = os.environ.get("EDTR_BENCH_STAGES", "1") == "1"
FUSED = os.environ.get("EDTR_BENCH_FUSED", "0") == "1"
SPLIT = os.environ.get("EDTR_BENCH_SPLIT", "1") == "1"


def _flops(compiled):
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0] if cost else {}
        return float(cost.get("flops", 0.0))
    except Exception:
        return 0.0


def _timeit(fn, *args, iters=ITERS):
    # data-dependent chaining: independent re-dispatches of one executable
    # do not serialize (and block_until_ready does not fence) on the
    # tunneled chip — see edtr_tpu/utils/benchtime.py for the measurements
    from edtr_tpu.utils.benchtime import timeit_chained

    return timeit_chained(fn, *args, iters=iters)


def _stage_breakdown(pipe, params, det, det_vars, lq, c_txt, rng):
    """Steady-state ms/img for each pipeline stage, separately compiled.

    Mirrors tools/profile_stages.py; failures degrade to None per stage so
    the primary throughput line always prints. Returns ``(stages,
    scan_flops)`` where scan_flops is the denoise executable's cost-analysis
    flops (body counted ``scan_bodies_counted(K)`` times — the callers
    normalize to per-body before scaling by trip count).
    """
    import jax
    import jax.numpy as jnp

    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.utils.image import wavelet_reconstruction

    stages = {}
    scan_flops = 0.0

    def run(name, make):
        try:
            t = make()
            stages[name] = round(t * 1e3 / BATCH, 2)
        except Exception as e:  # pragma: no cover - diagnostic path
            import sys

            print(f"# stage {name} failed: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)
            stages[name] = None

    sw = jax.jit(lambda p, x: pipe.pre_restore(p, x))
    pre = sw(params, lq)
    run("swinir", lambda: _timeit(sw, params, lq))

    enc = jax.jit(lambda p, x: pipe.cldm.vae_encode(p, x * 2 - 1, sample=False))
    z_pre = enc(params, pre)
    run("vae_encode", lambda: _timeit(enc, params, pre))

    cond = dict(c_txt=c_txt, c_img=z_pre)
    noise = jax.random.normal(rng, z_pre.shape, z_pre.dtype)
    t0 = jnp.full((BATCH,), pipe.start_timestep, jnp.int32)
    z_T = pipe.diffusion.q_sample(z_pre, t0, noise)

    scan = jax.jit(
        lambda p, zT, key: sample_scan(pipe.cldm.model_fn(p), pipe.schedule, zT, cond, key)
    ).lower(params, z_T, rng).compile()
    scan_flops = _flops(scan)
    z = scan(params, z_T, rng)
    run("scan", lambda: _timeit(scan, params, z_T, rng))

    dec = jax.jit(lambda p, zz: pipe.cldm.vae_decode(p, zz))
    decoded = dec(params, z)
    run("vae_decode", lambda: _timeit(dec, params, z))

    wav = jax.jit(wavelet_reconstruction)
    run("wavelet", lambda: _timeit(wav, (decoded + 1) / 2, pre))

    if det is not None:
        det_fn = jax.jit(lambda v, x: det.apply(v, x)[0]["scores"])
        run("detect", lambda: _timeit(det_fn, det_vars, lq.astype(jnp.bfloat16)))
    return stages, scan_flops


def main() -> None:
    from edtr_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    # the axon sitecustomize force-registers the TPU ahead of JAX_PLATFORMS;
    # honor an explicit JAX_PLATFORMS=cpu (CI / sanity runs) anyway
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    else:
        # a relay outage makes the first device touch hang forever; fail
        # fast (bounded wait + one subprocess probe) instead — the kernel
        # probe below is that first touch
        from edtr_tpu.utils.tunnel import ensure_tpu_reachable

        ensure_tpu_reachable()

    # fail-safe: a Mosaic regression in the optional fused kernels must
    # degrade to the XLA reference paths, never crash the bench
    from edtr_tpu.ops.kernel_probe import ensure_fused_kernels_usable

    ensure_fused_kernels_usable()

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

    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, image_size, image_size, 3))
    rng = jax.random.PRNGKey(231)

    # the restore executable ingests the PREVIOUS restored output (bf16) and
    # performs the recycle clip+cast itself: zero eager ops between timed
    # dispatches, and one compile covers warm-up and steady state
    def restore_step(p, prev, key):
        lq_in = jnp.clip(prev, 0, 1).astype(jnp.float32)
        return pipe.restore(p, lq_in, key, c_txt=c_txt)["restored"]

    prev0 = lq.astype(jnp.bfloat16)

    if FUSED and detnet is not None:
        def fused(p, dv, prev, key):
            restored = restore_step(p, prev, key)
            scores = detnet.apply(dv, restored)[0]["scores"]
            return restored.astype(jnp.bfloat16), scores

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
            stages = scan_flops = None
            if WITH_STAGES and not tiny:
                stages, scan_flops = _stage_breakdown(
                    pipe, params, detnet, det_vars, lq, c_txt, rng)
            if scan_flops:
                # cost analysis already counted `bodies` copies of the scan
                # body inside the fused executable (1 rolled, `unroll` + rem
                # when EDTR_SCAN_UNROLL is set); add the uncounted trips
                from edtr_tpu.diffusion.sampler import scan_bodies_counted

                K = len(pipe.used_timesteps)
                bodies = scan_bodies_counted(K)
                total_flops += (K - bodies) * (scan_flops / bodies)
            _report(dt, total_flops, detnet, image_size, stages)
            return
        except Exception as e:
            import sys

            print(f"# fused graph fell back: {type(e).__name__}: {e}",
                  file=sys.stderr, flush=True)

    if SPLIT:
        _run_split(pipe, params, detnet, det_vars, prev0, c_txt, rng)
        return

    # two executables (restore | detect): a single fused graph's buffer
    # assignment exceeds HBM headroom (restore holds scan state while the
    # detector's buffers are live); sequential executables share the chip
    # with restore temps freed between dispatches.
    restore_fn = jax.jit(
        lambda p, prev, key: restore_step(p, prev, key).astype(jnp.bfloat16)
    ).lower(params, prev0, rng).compile()

    out = restore_fn(params, prev0, rng)
    out.block_until_ready()
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

    out = restore_fn(params, out, rng)  # steady-state warm-up (same dtypes)
    if detect_fn is not None:
        detect_fn(det_vars, out).block_until_ready()
    else:
        out.block_until_ready()

    t0 = time.time()
    for i in range(ITERS):
        out = restore_fn(params, out, jax.random.fold_in(rng, i))
        if detect_fn is not None:
            scores = detect_fn(det_vars, out)
    # force full materialization: on the axon tunnel, block_until_ready can
    # return before queued work completes; a host read cannot
    sink = float(out.astype(jnp.float32).mean())
    if detect_fn is not None:
        sink += float(scores.astype(jnp.float32).mean())
    dt = (time.time() - t0) / ITERS

    stages = scan_flops = None
    if WITH_STAGES and not tiny:
        stages, scan_flops = _stage_breakdown(
            pipe, params, detnet, det_vars, lq, c_txt, rng)
    if scan_flops:  # see the unroll-aware accounting note in the FUSED path
        from edtr_tpu.diffusion.sampler import scan_bodies_counted

        K = len(pipe.used_timesteps)
        bodies = scan_bodies_counted(K)
        total_flops += (K - bodies) * (scan_flops / bodies)
    _report(dt, total_flops, detnet, image_size, stages)


def _run_split(pipe, params, detnet, det_vars, prev0, c_txt, rng):
    """Stage-wise executable pipeline: the e2e loop dispatches five AOT
    executables per iteration (dispatch RTT measured ~0.01 ms on the
    tunnel). Avoids the monolithic executable's buffer-pressure slowdown
    while still timing the FULL pipeline as a serial dependency chain.

    Also serves as the per-stage breakdown: each stage is timed with the
    same executables used in the loop (no separate stage compiles).
    """
    import jax
    import jax.numpy as jnp

    from edtr_tpu.diffusion.sampler import sample_scan
    from edtr_tpu.utils.image import wavelet_reconstruction

    image_size = prev0.shape[1]

    def stage_swinir(p, prev):
        lq_in = jnp.clip(prev, 0, 1).astype(jnp.float32)
        return pipe.pre_restore(p, lq_in)

    def stage_encode(p, pre):
        return pipe.cldm.vae_encode(p, pre * 2 - 1, sample=False)

    def stage_denoise(p, z_pre, key):
        cond = dict(c_txt=c_txt, c_img=z_pre)
        k1, k2 = jax.random.split(key)
        noise = jax.random.normal(k1, z_pre.shape, z_pre.dtype)
        t = jnp.full((z_pre.shape[0],), pipe.start_timestep, jnp.int32)
        z_T = pipe.diffusion.q_sample(z_pre, t, noise)
        return sample_scan(pipe.cldm.model_fn(p), pipe.schedule, z_T, cond, k2)

    def stage_decode(p, z, pre):
        decoded = (pipe.cldm.vae_decode(p, z) + 1) / 2
        return wavelet_reconstruction(decoded, pre).astype(jnp.bfloat16)

    aot = {}
    pre = None

    def compile_chain():
        nonlocal pre
        aot["swinir"] = jax.jit(stage_swinir).lower(params, prev0).compile()
        pre = aot["swinir"](params, prev0)
        aot["vae_encode"] = jax.jit(stage_encode).lower(params, pre).compile()
        z_pre = aot["vae_encode"](params, pre)
        aot["scan"] = jax.jit(stage_denoise).lower(params, z_pre, rng).compile()
        z = aot["scan"](params, z_pre, rng)
        aot["decode+wavelet"] = jax.jit(stage_decode).lower(params, z, pre).compile()
        out = aot["decode+wavelet"](params, z, pre)
        if detnet is not None:
            aot["detect"] = jax.jit(
                lambda dv, x: detnet.apply(dv, x)[0]["scores"]
            ).lower(det_vars, out).compile()
        return out

    out = compile_chain()
    jax.block_until_ready(out)

    def chain(prev, key):
        pre = aot["swinir"](params, prev)
        z_pre = aot["vae_encode"](params, pre)
        z = aot["scan"](params, z_pre, key)
        img = aot["decode+wavelet"](params, z, pre)
        scores = aot["detect"](det_vars, img) if "detect" in aot else None
        return img, scores

    out, scores = chain(prev0, rng)  # steady-state dtype warm-up
    jax.block_until_ready(out)

    # serial single-stream latency (the honest per-request number)
    t0 = time.time()
    for i in range(ITERS):
        out, scores = chain(out, jax.random.fold_in(rng, i))
    sink = float(out.astype(jnp.float32).mean())
    if scores is not None:
        sink += float(scores.astype(jnp.float32).mean())
    dt_serial = (time.time() - t0) / ITERS

    # throughput: STREAMS independent recycling chains interleaved — lets the
    # runtime overlap per-execution bubbles exactly like a serving pipeline
    # with >1 in-flight request (the monolith measured ~10 ms/img of
    # serial-chain bubble on the tunnel)
    streams = max(1, int(os.environ.get("EDTR_BENCH_STREAMS", "3")))
    outs = [chain(prev0, jax.random.fold_in(rng, 1000 + s))[0]
            for s in range(streams)]
    jax.block_until_ready(outs)
    # three consecutive windows, same total work; a transient relay stall
    # (the tunnel occasionally freezes dispatch for seconds — r4 measured
    # 12.9-13.5 img/s run-to-run spread on identical executables) lands in
    # one window. Headline = the MEDIAN window (ADVICE r4 #1: min-of-2 was
    # an optimistic statistic — a real persistent slowdown straddling one
    # window got discarded); a lone stalled window still gets filtered, and
    # when the windows disagree >5% a stall flag is emitted. ALL windows are
    # reported (e2e_windows_ms_per_img).
    window_dts = []
    last_scores = None
    for w in range(3):
        t0 = time.time()
        for i in range(ITERS):
            for s in range(streams):
                outs[s], last_scores = chain(
                    outs[s], jax.random.fold_in(rng, (w * ITERS + i) * streams + s))
        sink += sum(float(o.astype(jnp.float32).mean()) for o in outs)
        window_dts.append((time.time() - t0) / (ITERS * streams))
    if last_scores is not None:
        sink += float(last_scores.astype(jnp.float32).mean())
    dt = sorted(window_dts)[len(window_dts) // 2]
    window_stall = (max(window_dts) - min(window_dts)) / min(window_dts) > 0.05

    # XLA cost analysis counts ONE copy of a lax.scan body per copy present
    # in the HLO, regardless of trip count: 1 for a rolled scan, `unroll`
    # (+ remainder) when EDTR_SCAN_UNROLL is set, K when fully unrolled
    # (scan_bodies_counted, verified empirically). The denoise executable is
    # ~entirely its body — K UNet + ControlNet forwards; q_sample/posterior
    # are negligible elementwise — so true scan flops =
    # K x reported / bodies_counted (error < 0.1%).
    from edtr_tpu.diffusion.sampler import scan_bodies_counted

    K = len(pipe.used_timesteps)
    stage_flops = {k: _flops(c) for k, c in aot.items()}
    stage_flops["scan"] *= K / scan_bodies_counted(K)
    total_flops = sum(stage_flops.values())

    # per-stage steady state with the SAME executables
    stages = {}
    z_pre_s = aot["vae_encode"](params, pre)
    z_s = aot["scan"](params, z_pre_s, rng)
    stages["swinir"] = round(_timeit(aot["swinir"], params, prev0) * 1e3 / BATCH, 2)
    stages["vae_encode"] = round(_timeit(aot["vae_encode"], params, pre) * 1e3 / BATCH, 2)
    stages["scan"] = round(_timeit(aot["scan"], params, z_pre_s, rng) * 1e3 / BATCH, 2)
    stages["decode+wavelet"] = round(
        _timeit(aot["decode+wavelet"], params, z_s, pre) * 1e3 / BATCH, 2)
    if "detect" in aot:
        stages["detect"] = round(
            _timeit(aot["detect"], det_vars, out) * 1e3 / BATCH, 2)
    stages["serial_1stream_ms_per_img"] = round(dt_serial * 1e3 / BATCH, 2)
    stages["throughput_streams"] = streams
    stages["e2e_windows_ms_per_img"] = [
        round(w * 1e3 / BATCH, 2) for w in window_dts]
    if window_stall:
        stages["window_stall"] = True  # >5% spread across the 3 windows

    _report(dt, total_flops, detnet, image_size, stages, stage_flops)


def _report(dt, total_flops, detnet, image_size, stages=None, stage_flops=None):
    import jax

    img_s = BATCH / dt
    stage_desc = "SwinIR + 4-step ControlNet/UNet scan + VAE decode + wavelet" + (
        " + FasterRCNN-mobilenet-FPN detect" if detnet is not None else ""
    )
    # model FLOPs utilization: XLA cost-analysis flops of the executables
    # over measured wall-clock, vs the chip's bf16 peak
    kind = jax.devices()[0].device_kind.lower()
    peak = 197e12 if ("v5 lite" in kind or "v5e" in kind) else (
        459e12 if "v5p" in kind else 275e12 if "v4" in kind else 197e12)
    mfu = (total_flops / dt) / peak if total_flops > 0 else -1.0
    rec = {
        "metric": f"EDTR-s4 {image_size}x{image_size} restore ({stage_desc}), bs={BATCH}, bf16",
        "value": round(img_s, 3),
        "unit": "images/sec/chip",
        # vs an engineering ESTIMATE of the torch reference on A6000 fp16
        # (reference publishes no numbers; see module docstring)
        "vs_baseline": round(img_s / A6000_BASELINE_IMG_S, 3),
        "vs_baseline_kind": "estimate",
        "mfu": round(mfu, 4),
        "tflops_per_img": round(total_flops / BATCH / 1e12, 2),
        "e2e_ms_per_img": round(dt * 1e3 / BATCH, 2),
        # rounds <=2 underreported MFU: XLA cost analysis counts one scan
        # body per HLO copy (1 rolled, `unroll` when EDTR_SCAN_UNROLL is
        # set); flops here normalize to per-body and scale by K
        "flops_accounting": "scan body x K / bodies_counted",
        # which optional fused Pallas kernels were active (the
        # fail-safe probe flips these off instead of crashing; idempotent)
        "fused_kernels": __import__(
            "edtr_tpu.ops.kernel_probe",
            fromlist=["ensure_fused_kernels_usable"]
        ).ensure_fused_kernels_usable(),
    }
    if stages is not None:
        rec["stages_ms_per_img"] = stages
    if stages and stage_flops:
        # per-stage MFU from the same executables' cost analysis — shows
        # which stage is furthest from roofline directly in the artifact
        rec["stages_mfu"] = {
            k: round((f / (stages[k] * BATCH / 1e3)) / peak, 3)
            for k, f in stage_flops.items()
            if stages.get(k) and f > 0
        }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
