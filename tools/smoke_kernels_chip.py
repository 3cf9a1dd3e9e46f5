#!/usr/bin/env python
"""Fast on-chip smoke for the round-3 fused kernels (numerics only).

Small shapes -> quick compiles; asserts each kernel's Pallas path matches
its XLA reference on the real TPU. Run BEFORE the full verify_chip queue
so a lowering regression localizes in ~2 min instead of ~40.

    PYTHONPATH=/root/repo python tools/smoke_kernels_chip.py
"""
import os
import sys

# force mode: exercise the Pallas path wherever the kernel supports the
# shape, independent of the measured dispatch table (ops/dispatch.py) —
# otherwise table-off shapes would silently compare XLA against XLA and
# the smoke would test nothing there.
for _v in ("EDTR_SWIN_FUSED", "EDTR_GEGLU_FUSED", "EDTR_LNMM_FUSED",
           "EDTR_GNCONV_FUSED", "EDTR_UPSCONV_FUSED"):
    os.environ[_v] = "force"

import jax
import jax.numpy as jnp

print("devices:", jax.devices(), flush=True)
assert jax.default_backend() == "tpu", jax.default_backend()

from edtr_tpu.ops import gn_conv
from edtr_tpu.ops.gn_conv import gn_silu_conv, gn_fold, upsample_conv, _ref, _ups_ref
from edtr_tpu.ops.ln_matmul import affine_matmul, ln_matmuls, _aff_ref
from edtr_tpu.ops import ln_matmul as lnm
from edtr_tpu.ops.geglu import geglu_proj, ln_geglu_proj
from edtr_tpu.ops import geglu as geglu_mod

ok = True


def check(name, got, want, tol):
    global ok
    err = float(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
    scale = float(jnp.abs(want.astype(jnp.float32)).max())
    rel = err / max(scale, 1e-6)
    status = "OK " if rel < tol else "FAIL"
    if rel >= tol:
        ok = False
    print(f"{status} {name}: max_abs={err:.5f} rel={rel:.5f}", flush=True)


key = jax.random.PRNGKey(0)

# --- gn_silu_conv: band tier (64x64, 32x32) + whole-image tier (8x8) ---
for (h, cin, cout, use_emb, use_res) in [
    (64, 320, 320, True, False),
    (32, 640, 640, True, True),
    (16, 1280, 1280, True, True),
    (8, 1280, 1280, True, True),
]:
    ks = jax.random.split(jax.random.fold_in(key, h * cin), 7)
    B = 2
    x = jax.random.normal(ks[0], (B, h, h, cin), jnp.bfloat16)
    sc = jax.random.normal(ks[1], (cin,), jnp.float32) * 0.2 + 1.0
    bi = jax.random.normal(ks[2], (cin,), jnp.float32) * 0.1
    w = jax.random.normal(ks[3], (3, 3, cin, cout), jnp.float32) * 0.02
    b = jax.random.normal(ks[4], (cout,), jnp.float32) * 0.1
    emb = (jax.random.normal(ks[5], (B, cout), jnp.bfloat16)
           if use_emb else None)
    res = (jax.random.normal(ks[6], (B, h, h, cout), jnp.bfloat16)
           if use_res else None)
    mul, add = gn_fold(x, sc, bi)
    plan_b = gn_conv._band_plan(h, h, cin, cout, use_res)
    plan_w = gn_conv._plan(h, h, cin, cout, use_res)
    got = jax.jit(gn_silu_conv)(x, mul, add, w, b, emb, res)
    want = jax.jit(_ref)(x, mul, add, w, b, emb, res)
    check(f"gn_silu_conv {h}x{h}x{cin}->{cout} band={plan_b} whole={plan_w}",
          got, want, 0.03)

# --- upsample_conv: VAE decoder (128->256) small + SwinIR tail shape ---
for (hl, cin, cout, act) in [(32, 512, 512, None), (16, 64, 64, "lrelu")]:
    ks = jax.random.split(jax.random.fold_in(key, hl + cin), 3)
    x = jax.random.normal(ks[0], (2, hl, hl, cin), jnp.bfloat16)
    w = jax.random.normal(ks[1], (3, 3, cin, cout), jnp.float32) * 0.05
    b = jax.random.normal(ks[2], (cout,), jnp.float32) * 0.1
    got = jax.jit(lambda x, w, b: upsample_conv(x, w, b, act))(x, w, b)
    want = jax.jit(lambda x, w, b: _ups_ref(x, w, b, act))(x, w, b)
    check(f"upsample_conv {hl}->{2*hl} c{cin}->{cout} act={act}",
          got, want, 0.03)

# --- affine_matmul (SpatialTransformer proj_in) ---
B, n, c, o = 2, 1024, 320, 320
ks = jax.random.split(jax.random.fold_in(key, 11), 5)
x = jax.random.normal(ks[0], (B, n, c), jnp.bfloat16)
mul = jax.random.normal(ks[1], (B, c), jnp.float32) * 0.2 + 1.0
add = jax.random.normal(ks[2], (B, c), jnp.float32) * 0.1
w = jax.random.normal(ks[3], (c, o), jnp.float32) * 0.05
b = jax.random.normal(ks[4], (o,), jnp.float32) * 0.1
got = jax.jit(affine_matmul)(x, mul, add, w, b)
want = jax.jit(_aff_ref)(x, mul, add, w, b)
check(f"affine_matmul {B}x{n}x{c}->{o}", got, want, 0.03)

# --- ln_matmuls (norm->qkv) ---
ks = jax.random.split(jax.random.fold_in(key, 13), 6)
x = jax.random.normal(ks[0], (B, n, c), jnp.bfloat16)
ls = jax.random.normal(ks[1], (c,), jnp.float32) * 0.2 + 1.0
lb = jax.random.normal(ks[2], (c,), jnp.float32) * 0.1
ws = [jax.random.normal(k, (c, c), jnp.float32) * 0.05 for k in ks[3:6]]
got = jax.jit(lambda *a: ln_matmuls(*a))(x, ls, lb, *ws)
want = jax.jit(lambda *a: lnm._ref(*a))(x, ls, lb, *ws)
for gi, wi in zip(got, want):
    check(f"ln_matmuls {B}x{n}x{c}", gi, wi, 0.03)

# --- geglu ---
ks = jax.random.split(jax.random.fold_in(key, 17), 5)
dff = 4 * c
x = jax.random.normal(ks[0], (B, n, c), jnp.bfloat16)
wh = jax.random.normal(ks[1], (c, dff), jnp.float32) * 0.05
wg = jax.random.normal(ks[2], (c, dff), jnp.float32) * 0.05
bh = jax.random.normal(ks[3], (dff,), jnp.float32) * 0.1
bg = jax.random.normal(ks[4], (dff,), jnp.float32) * 0.1
got = jax.jit(geglu_proj)(x, wh, wg, bh, bg)
want = jax.jit(geglu_mod._ref)(x, wh, wg, bh, bg)
check(f"geglu_proj {B}x{n}x{c}", got, want, 0.03)

# --- swin block halves ---
from edtr_tpu.ops import swin_block as sb
print("swin fused enabled:", sb._use_kernel(), flush=True)

print("ALL OK" if ok else "FAILURES", flush=True)
sys.exit(0 if ok else 1)
