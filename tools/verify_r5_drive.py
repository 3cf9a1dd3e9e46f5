#!/usr/bin/env python
"""Round-5 /verify drive: the touched compute paths on the real TPU chip.

1. whole-KV flash attention as the shipped bigseq default (scan path).
2. subpixel nearest+conv upsample formulation (EDTR_UPS_SUBPIX gate).
Asserts numerics vs the XLA references on chip; prints VERIFY OK.
"""
import os, sys, time
import jax, jax.numpy as jnp

def p(*a):
    print(*a, flush=True)

p("devices:", jax.devices())
from edtr_tpu.ops.attention import dot_product_attention, _xla_attention
from edtr_tpu.ops import flash_attention as fa
assert fa._bigseq_variant() == "wholekv", fa._bigseq_variant()
k = jax.random.PRNGKey(0)
q = jax.random.normal(k, (2, 2048, 5, 64), jnp.bfloat16)
t0 = time.time()
out = jax.jit(lambda q: dot_product_attention(q, q, q, 64 ** -0.5))(q)
out.block_until_ready()
p("attention seq2048 d64 (default=wholekv):", out.shape, out.dtype,
  f"compile+run {time.time()-t0:.1f}s")
ref = jax.jit(lambda q: _xla_attention(q, q, q, 64 ** -0.5))(q)
err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
p("wholekv vs xla max abs err on chip:", err)
assert err < 0.05, err

os.environ["EDTR_UPS_SUBPIX"] = "1"
from edtr_tpu.ops import gn_conv
x = jax.random.normal(k, (2, 64, 64, 64), jnp.bfloat16)
w = (jax.random.normal(jax.random.PRNGKey(1), (3, 3, 64, 64)) * 0.1).astype(jnp.float32)
b = jnp.zeros((64,), jnp.float32)
t0 = time.time()
y_sub = jax.jit(lambda x: gn_conv.upsample_conv(x, w, b, "lrelu"))(x)
y_sub.block_until_ready()
p("subpixel ups on chip:", y_sub.shape, f"compile+run {time.time()-t0:.1f}s")
os.environ["EDTR_UPS_SUBPIX"] = "0"
y_ref = jax.jit(lambda x: gn_conv._ups_ref(x, w, b, "lrelu"))(x)
rel = float(jnp.abs(y_sub.astype(jnp.float32) - y_ref.astype(jnp.float32)).max()
            / jnp.abs(y_ref.astype(jnp.float32)).max())
p("subpixel vs ref rel err on chip (bf16):", rel)
assert rel < 0.05, rel
p("VERIFY OK")
