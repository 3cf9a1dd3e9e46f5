#!/usr/bin/env python
"""/verify drive for the round-5 serving-path lane-pad wiring.

Touched code: pipeline.build_pipeline_from_config (EDTR_SWINIR_PAD gate),
train/runner.build_edtr_models (init-through-unpadded-twin then
pad_swinir_lanes), demo.py combined-ckpt pad (same converter call, driven
here without a ckpt file via the runner branch).

Drives the REAL config path on the REAL chip: loads the flagship test
YAML (reference-style target strings -> registry remap), builds the
padded pipeline + params exactly as demo.py would, runs pre_restore under
jit on the TPU, and checks the padded serving net matches the unpadded
twin built from the same PRNGKey(0) init (the zero-pad exactness
contract, now on hardware).
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ["EDTR_SWINIR_PAD"] = "1"


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from edtr_tpu.config import load_config
    from edtr_tpu.train.runner import build_edtr_models

    print("devices:", jax.devices(), flush=True)
    cfg = load_config(
        os.path.join(REPO, "configs/det/voc2012/test/007_edtr-s4.yaml"))
    t0 = time.time()
    pipe, params = build_edtr_models(cfg)
    assert pipe.swinir.lane_pad == 12, pipe.swinir.lane_pad
    import numpy as np

    k = np.asarray(params["swinir"]["conv_after_body"]["kernel"])
    assert k.shape[-1] == 192 and np.all(k[..., 180:] == 0)
    print(f"build_edtr_models (padded) OK in {time.time() - t0:.0f}s",
          flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(3), (1, 512, 512, 3))
    bf = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a, params["swinir"])
    t0 = time.time()
    y_pad = jax.jit(lambda p, t: pipe.swinir.apply({"params": p}, t))(
        bf, x)
    y_pad.block_until_ready()
    print(f"padded pre_restore on chip: {y_pad.shape} {y_pad.dtype} "
          f"compile+run {time.time() - t0:.0f}s", flush=True)

    # unpadded twin from the same seed (runner inits the twin w/ PRNGKey(0))
    twin = dataclasses.replace(pipe.swinir, lane_pad=0)
    p0 = jax.jit(twin.init)(jax.random.PRNGKey(0),
                            jnp.zeros((1, 64, 64, 3)))["params"]
    p0 = jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                      if a.dtype == jnp.float32 else a, p0)
    y0 = jax.jit(lambda p, t: twin.apply({"params": p}, t))(p0, x)
    y0.block_until_ready()
    d = float(jnp.max(jnp.abs(y_pad.astype(jnp.float32)
                              - y0.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(y0.astype(jnp.float32)))) or 1.0
    print(f"padded-vs-twin max abs err on chip (bf16): {d} "
          f"(rel {d / scale:.4g})", flush=True)
    assert d / scale < 2e-2, (d, scale)
    print("VERIFY OK", flush=True)


if __name__ == "__main__":
    main()
