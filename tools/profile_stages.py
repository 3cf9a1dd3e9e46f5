#!/usr/bin/env python
"""Per-stage latency breakdown of the EDTR-s4 512px restore graph on TPU.

Prints steady-state ms for: SwinIR, CLIP-free cond (vae_encode), the 4-step
ControlNet+UNet scan, VAE decode, wavelet, detection — the profile that
drives kernel-optimization priorities (SURVEY.md §3.1 hot-loop ranking).
"""

import os
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import jax
import jax.numpy as jnp

import __graft_entry__ as G
from edtr_tpu.diffusion.sampler import sample_scan
from edtr_tpu.utils.image import wavelet_reconstruction
from edtr_tpu.utils.profiling import timeit

BATCH = int(os.environ.get("EDTR_BENCH_BATCH", "4"))
SIZE = int(os.environ.get("EDTR_PROFILE_SIZE", "512"))


def main():
    pipe = G._flagship_pipeline(dtype=jnp.bfloat16, tiny=False)
    params = G._init_params(pipe, jax.random.PRNGKey(0), SIZE)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (BATCH, SIZE, SIZE, 3))
    c_txt = jnp.zeros((BATCH, 77, 1024), jnp.float32)
    rng = jax.random.PRNGKey(2)

    sw = jax.jit(lambda p, x: pipe.pre_restore(p, x))
    pre = sw(params, lq)
    t_sw = timeit(sw, params, lq)

    enc = jax.jit(lambda p, x: pipe.cldm.vae_encode(p, x * 2 - 1, sample=False))
    z_pre = enc(params, pre)
    t_enc = timeit(enc, params, pre)

    cond = dict(c_txt=c_txt, c_img=z_pre)
    noise = jax.random.normal(rng, z_pre.shape, z_pre.dtype)
    t0 = jnp.full((BATCH,), pipe.start_timestep, jnp.int32)
    z_T = pipe.diffusion.q_sample(z_pre, t0, noise)

    scan = jax.jit(
        lambda p, zT, key: sample_scan(pipe.cldm.model_fn(p), pipe.schedule, zT, cond, key)
    )
    z = scan(params, z_T, rng)
    t_scan = timeit(scan, params, z_T, rng)

    dec = jax.jit(lambda p, zz: pipe.cldm.vae_decode(p, zz))
    decoded = dec(params, z)
    t_dec = timeit(dec, params, z)

    wav = jax.jit(wavelet_reconstruction)
    t_wav = timeit(wav, (decoded + 1) / 2, pre)

    from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn

    det = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21, dtype=jnp.bfloat16)
    dv = jax.jit(det.init)({"params": jax.random.PRNGKey(3)}, lq)
    det_fn = jax.jit(lambda v, x: det.apply(v, x)[0]["scores"])
    det_fn(dv, lq).block_until_ready()
    t_det = timeit(det_fn, dv, lq)

    total = t_sw + t_enc + t_scan + t_dec + t_wav + t_det
    for name, t in [("swinir", t_sw), ("vae_encode", t_enc),
                    ("4-step scan", t_scan), ("vae_decode", t_dec),
                    ("wavelet", t_wav), ("detect", t_det)]:
        print(f"{name:>12}: {t * 1e3 / BATCH:8.2f} ms/img  ({100 * t / total:5.1f}%)")
    print(f"{'TOTAL':>12}: {total * 1e3 / BATCH:8.2f} ms/img -> {BATCH / total:.2f} img/s")


if __name__ == "__main__":
    main()
