#!/usr/bin/env python
"""On-chip validation queue for the round-3 kernel/serving changes.

Run on the real TPU (from the repo root, or with
PYTHONPATH=/root/repo:/root/.axon_site):

    python tools/verify_chip.py

Covers, in order (fast compiles first so failures localize):
  1. flash attention fwd/bwd vs the XLA oracle at KV_BLOCK=1024
  2. bs16 detector with the chunked lax.map NMS (the worker-crash fix)
  2.5 standalone fused swin kernels vs reference (both shift parities)
  2.6 fused GEGLU vs reference + timing at the three transformer levels
  2.7 fused LN+GEMMs vs reference + timing
  2.8 cost-analysis cross-check (pallas flops visible to XLA)
  3. fused-vs-legacy SwinIR: full-net numerics + timing

Each section asserts numerics and prints timings; ~30-50 min total
(the bs16 detector compile dominates).
"""
# Combined chip-validation queue (one process, serialized):
#  1. flash attention @KV_BLOCK=1024 fwd/bwd vs XLA oracle
#  2. bs16 detector with chunked lax.map NMS (the r3 worker-crash fix)
#  3. fused SwinIR vs legacy: numerics + timing
#  4. ResBlock split micro-bench (fusion prize sizing)
import json, time, sys
import jax, jax.numpy as jnp
print("devices:", jax.devices(), flush=True)

# --- 1. flash kernels ---
from edtr_tpu.ops.flash_attention import flash_attention
from edtr_tpu.ops.attention import _xla_attention
for B,S,H,D in [(8,1024,5,64),(2,4096,5,64)]:
    q = jax.random.normal(jax.random.PRNGKey(0),(B,S,H,D),jnp.bfloat16)
    k = jax.random.normal(jax.random.PRNGKey(1),(B,S,H,D),jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2),(B,S,H,D),jnp.bfloat16)
    f = jax.jit(lambda q,k,v: flash_attention(q,k,v,64**-0.5))(q,k,v)
    o = jax.jit(lambda q,k,v: _xla_attention(q,k,v,64**-0.5))(q,k,v)
    err = float(jnp.abs(f.astype(jnp.float32)-o.astype(jnp.float32)).max())
    print(f"flash seq={S}: max_abs_err={err:.4f}", flush=True)
    assert err < 0.06, err
def loss_f(q): return flash_attention(q,k,v,64**-0.5).astype(jnp.float32).sum()
def loss_o(q): return _xla_attention(q,k,v,64**-0.5).astype(jnp.float32).sum()
gf = jax.jit(jax.grad(loss_f))(q); go = jax.jit(jax.grad(loss_o))(q)
gerr = float(jnp.abs(gf.astype(jnp.float32)-go.astype(jnp.float32)).max())
print(f"flash bwd seq=4096: max_abs_err={gerr:.4f}", flush=True)
assert gerr < 0.1, gerr

# --- 2. bs16 detector (chunked NMS) ---
from edtr_tpu.models.faster_rcnn import fasterrcnn_mobilenet_v3_large_fpn
det = fasterrcnn_mobilenet_v3_large_fpn(num_classes=21, dtype=jnp.bfloat16)
dv = jax.jit(det.init)({"params": jax.random.PRNGKey(7)}, jnp.zeros((16,512,512,3)))
x = jax.random.uniform(jax.random.PRNGKey(3),(16,512,512,3)).astype(jnp.bfloat16)
t0=time.time()
fn = jax.jit(lambda v,x: det.apply(v,x)[0]["scores"]).lower(dv,x).compile()
print(f"bs16 detect compiled in {time.time()-t0:.1f}s", flush=True)
s = fn(dv,x); s.block_until_ready()
print("bs16 detect OK:", s.shape, float(s.astype(jnp.float32).mean()), flush=True)
fn8 = jax.jit(lambda v,x: det.apply(v,x)[0]["scores"]).lower(dv, x[:8]).compile()
s8 = fn8(dv, x[:8]); s8.block_until_ready()
d = float(jnp.abs(s[:8].astype(jnp.float32)-s8.astype(jnp.float32)).max())
print(f"bs16[0:8] vs bs8 scores max_abs_diff={d:.5f}", flush=True)
assert d < 1e-2, d


# --- 2.5 standalone swin kernel probes (fast compiles; isolate Mosaic issues) ---
from edtr_tpu.ops import swin_block
import numpy as _np
h = w = 64; win = 8; c = 180; hid = 360
_g = _np.random.default_rng(5)
xk = jnp.asarray(_g.standard_normal((8, h*w, c)), jnp.bfloat16)
ln_s = jnp.asarray(_g.standard_normal(c), jnp.float32)
ln_b = jnp.asarray(_g.standard_normal(c), jnp.float32)
wqkv = jnp.asarray(_g.standard_normal((c, 3*c)) * 0.05, jnp.float32)
bqkv = jnp.asarray(_g.standard_normal(3*c), jnp.float32)
for dd in (0, 4, -4):
    t0 = time.time()
    got = jax.jit(lambda *a: swin_block.swin_pre(*a, h, w, win, dd))(xk, ln_s, ln_b, wqkv, bqkv)
    jax.block_until_ready(got)
    ref = jax.jit(lambda *a: swin_block._pre_ref(*a, h, w, win, dd))(xk, ln_s, ln_b, wqkv, bqkv)
    errs = [float(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)).max()) for a, b in zip(got, ref)]
    print(f"swin_pre d={dd}: compile+run {time.time()-t0:.1f}s errs={errs}", flush=True)
    assert max(errs) < 0.1, errs
nw = (h//win)*(w//win)
attnk = jnp.asarray(_g.standard_normal((8, nw, win*win, c)), jnp.bfloat16)
xrk = jnp.asarray(_g.standard_normal((8, h*w, c)), jnp.bfloat16)
wsk = [jnp.asarray(_g.standard_normal(s) * 0.05, jnp.float32)
       for s in [(c, c), (c,), (c,), (c,), (c, hid), (hid,), (hid, c), (c,)]]
t0 = time.time()
gotp = jax.jit(lambda *a: swin_block.swin_post(*a, h, w, win))(attnk, xrk, *wsk)
jax.block_until_ready(gotp)
refp = jax.jit(lambda *a: swin_block._post_ref(*a, h, w, win))(attnk, xrk, *wsk)
perr = float(jnp.abs(gotp.astype(jnp.float32)-refp.astype(jnp.float32)).max())
print(f"swin_post: compile+run {time.time()-t0:.1f}s err={perr:.4f}", flush=True)
assert perr < 0.1, perr


# --- 2.6 geglu kernel probe + timing at the three transformer levels ---
from edtr_tpu.ops import geglu as _geglu
from edtr_tpu.utils.benchtime import timeit_chained as _tc
for seq, ch in [(4096, 320), (1024, 640), (256, 1280)]:
    inner = 4 * ch
    _gg = _np.random.default_rng(9)
    xg = jnp.asarray(_gg.standard_normal((8, seq, ch)), jnp.bfloat16)
    whg = jnp.asarray(_gg.standard_normal((ch, inner)) * 0.05, jnp.float32)
    wgg = jnp.asarray(_gg.standard_normal((ch, inner)) * 0.05, jnp.float32)
    bhg = jnp.asarray(_gg.standard_normal(inner), jnp.float32)
    bgg = jnp.asarray(_gg.standard_normal(inner), jnp.float32)
    fk = jax.jit(lambda *a: _geglu.geglu_proj(*a)).lower(xg, whg, wgg, bhg, bgg).compile()
    fr = jax.jit(lambda *a: _geglu._ref(*a)).lower(xg, whg, wgg, bhg, bgg).compile()
    ok = fk(xg, whg, wgg, bhg, bgg); rk = fr(xg, whg, wgg, bhg, bgg)
    ge = float(jnp.abs(ok.astype(jnp.float32)-rk.astype(jnp.float32)).max())
    tk = _tc(fk, xg, whg, wgg, bhg, bgg, iters=10) * 1e3
    tr = _tc(fr, xg, whg, wgg, bhg, bgg, iters=10) * 1e3
    print(f"geglu {seq}x{ch}: err={ge:.4f} pallas {tk:.3f} ms  xla {tr:.3f} ms  speedup {tr/tk:.2f}x", flush=True)
    assert ge < 0.15, ge


# --- 2.7 ln_matmul kernel probe + timing ---
from edtr_tpu.ops import ln_matmul as _lnm
for seq, ch in [(4096, 320), (1024, 640), (256, 1280)]:
    _gl = _np.random.default_rng(11)
    xl = jnp.asarray(_gl.standard_normal((8, seq, ch)), jnp.bfloat16)
    sl = jnp.asarray(_gl.standard_normal(ch), jnp.float32)
    bl = jnp.asarray(_gl.standard_normal(ch), jnp.float32)
    wls = [jnp.asarray(_gl.standard_normal((ch, ch)) * 0.05, jnp.float32) for _ in range(3)]
    fk = jax.jit(lambda *a: _lnm.ln_matmuls(*a)).lower(xl, sl, bl, *wls).compile()
    fr = jax.jit(lambda *a: _lnm._ref(*a)).lower(xl, sl, bl, *wls).compile()
    ok = fk(xl, sl, bl, *wls); rk = fr(xl, sl, bl, *wls)
    ge = max(float(jnp.abs(a.astype(jnp.float32)-b.astype(jnp.float32)).max()) for a, b in zip(ok, rk))
    tk = _tc(fk, xl, sl, bl, *wls, iters=10) * 1e3
    tr = _tc(fr, xl, sl, bl, *wls, iters=10) * 1e3
    print(f"ln_matmuls(3) {seq}x{ch}: err={ge:.4f} pallas {tk:.3f} ms  xla {tr:.3f} ms  speedup {tr/tk:.2f}x", flush=True)
    assert ge < 0.15, ge


# --- 2.72 affine(GN-fold)+proj_in GEMM (SpatialTransformer entry) ---
for seq, ch, inner in [(4096, 320, 320), (1024, 640, 640), (256, 1280, 1280)]:
    _ga = _np.random.default_rng(12)
    xa = jnp.asarray(_ga.standard_normal((8, seq, ch)), jnp.bfloat16)
    ma = jnp.asarray(_ga.standard_normal((8, ch)) * 0.3 + 1, jnp.float32)
    aa = jnp.asarray(_ga.standard_normal((8, ch)) * 0.1, jnp.float32)
    wa = jnp.asarray(_ga.standard_normal((ch, inner)) * 0.05, jnp.float32)
    ba = jnp.asarray(_ga.standard_normal(inner) * 0.05, jnp.float32)
    fk = jax.jit(lambda *a: _lnm.affine_matmul(*a)).lower(
        xa, ma, aa, wa, ba).compile()
    fr = jax.jit(lambda *a: _lnm._aff_ref(*a)).lower(
        xa, ma, aa, wa, ba).compile()
    ok = fk(xa, ma, aa, wa, ba); rk = fr(xa, ma, aa, wa, ba)
    ge = float(jnp.abs(ok.astype(jnp.float32) - rk.astype(jnp.float32)).max())
    tk = _tc(fk, xa, ma, aa, wa, ba, iters=10) * 1e3
    tr = _tc(fr, xa, ma, aa, wa, ba, iters=10) * 1e3
    print(f"affine_matmul {seq}x{ch}: err={ge:.4f} pallas {tk:.3f} ms"
          f"  xla {tr:.3f} ms  speedup {tr/tk:.2f}x", flush=True)
    assert ge < 0.15, ge


# --- 2.75 fused GN+SiLU+conv ResBlock kernel: numerics + per-level timing ---
from edtr_tpu.ops import gn_conv as _gnc
from edtr_tpu.models.unet import ResBlock as _RB
for hh, cin, cout in [(64, 320, 320), (64, 640, 320), (64, 960, 320),
                      (32, 640, 640), (32, 320, 640), (8, 1280, 1280)]:
    if not _gnc.supported(hh, hh, cin, cout):
        print(f"gn_conv {hh}x{hh} {cin}->{cout}: UNSUPPORTED (XLA fallback)",
              flush=True)
        continue
    _gg = _np.random.default_rng(13)
    xg = jnp.asarray(_gg.standard_normal((8, hh, hh, cin)), jnp.bfloat16)
    mu = jnp.asarray(_gg.standard_normal((8, cin)) * 0.3 + 1, jnp.float32)
    ad = jnp.asarray(_gg.standard_normal((8, cin)) * 0.1, jnp.float32)
    wk = jnp.asarray(_gg.standard_normal((3, 3, cin, cout)) * 0.02,
                     jnp.float32)
    bk = jnp.asarray(_gg.standard_normal(cout) * 0.05, jnp.float32)
    eg = jnp.asarray(_gg.standard_normal((8, cout)) * 0.2, jnp.bfloat16)
    rg = jnp.asarray(_gg.standard_normal((8, hh, hh, cout)), jnp.bfloat16)
    fk = jax.jit(lambda *a: _gnc.gn_silu_conv(*a)).lower(
        xg, mu, ad, wk, bk, eg, rg).compile()
    fr = jax.jit(lambda *a: _gnc._ref(*a)).lower(
        xg, mu, ad, wk, bk, eg, rg).compile()
    ok = fk(xg, mu, ad, wk, bk, eg, rg); rk = fr(xg, mu, ad, wk, bk, eg, rg)
    ge = float(jnp.abs(ok.astype(jnp.float32) - rk.astype(jnp.float32)).max())
    tk = _tc(fk, xg, mu, ad, wk, bk, eg, rg, iters=10) * 1e3
    tr = _tc(fr, xg, mu, ad, wk, bk, eg, rg, iters=10) * 1e3
    tier = "band" if (hh >= 16 and _gnc._band_plan(hh, hh, cin, cout, True)
                      is not None) else "whole"
    print(f"gn_conv {hh}x{hh} {cin}->{cout} [{tier}]: err={ge:.4f} "
          f"pallas {tk:.3f} ms  xla {tr:.3f} ms  speedup {tr/tk:.2f}x",
          flush=True)
    assert ge < 0.25, ge
# full ResBlock module fused-vs-legacy at the flagship 64² level
xb = jax.random.normal(jax.random.PRNGKey(21), (8, 64, 64, 320), jnp.bfloat16)
ebt = jax.random.normal(jax.random.PRNGKey(22), (8, 1280), jnp.bfloat16)
rbf = _RB(out_channels=320, dtype=jnp.bfloat16, fused=True)
rbl = _RB(out_channels=320, dtype=jnp.bfloat16, fused=False)
pv = jax.jit(rbl.init)({"params": jax.random.PRNGKey(23)}, xb, ebt)["params"]
pv = jax.tree.map(lambda a: a + 0.02, pv)  # unzero out_conv
ff = jax.jit(lambda p, x, e: rbf.apply({"params": p}, x, e)).lower(
    pv, xb, ebt).compile()
fl = jax.jit(lambda p, x, e: rbl.apply({"params": p}, x, e)).lower(
    pv, xb, ebt).compile()
obf = ff(pv, xb, ebt); obl = fl(pv, xb, ebt)
rerr = float(jnp.abs(obf.astype(jnp.float32) - obl.astype(jnp.float32)).max())
tf_ = _tc(ff, pv, xb, ebt, iters=10) * 1e3
tl_ = _tc(fl, pv, xb, ebt, iters=10) * 1e3
print(f"ResBlock 64x64x320 fused vs legacy: err={rerr:.4f} "
      f"fused {tf_:.3f} ms  legacy {tl_:.3f} ms  speedup {tl_/tf_:.2f}x",
      flush=True)
assert rerr < 0.25, rerr

# --- 2.76 VAE ResnetBlock fused vs legacy (decoder hot shapes, bs4) ---
from edtr_tpu.models.vae import ResnetBlock as _VRB
for hh, cin, cout in [(512, 128, 128), (512, 256, 128), (256, 512, 256)]:
    if not _gnc.supported(hh, hh, cin, cout):
        print(f"vae_rb {hh}x{hh} {cin}->{cout}: UNSUPPORTED", flush=True)
        continue
    xv = jax.random.normal(jax.random.PRNGKey(31), (4, hh, hh, cin),
                           jnp.bfloat16)
    vf = _VRB(out_channels=cout, dtype=jnp.bfloat16, fused=True)
    vl = _VRB(out_channels=cout, dtype=jnp.bfloat16, fused=False)
    pvr = jax.jit(vl.init)({"params": jax.random.PRNGKey(32)}, xv)["params"]
    fvf = jax.jit(lambda p, x: vf.apply({"params": p}, x)).lower(
        pvr, xv).compile()
    fvl = jax.jit(lambda p, x: vl.apply({"params": p}, x)).lower(
        pvr, xv).compile()
    ovf = fvf(pvr, xv); ovl = fvl(pvr, xv)
    ve = float(jnp.abs(ovf.astype(jnp.float32) - ovl.astype(jnp.float32)).max())
    tvf = _tc(fvf, pvr, xv, iters=10) * 1e3
    tvl = _tc(fvl, pvr, xv, iters=10) * 1e3
    print(f"vae_rb {hh}x{hh} {cin}->{cout}: err={ve:.4f} fused {tvf:.3f} ms"
          f"  legacy {tvl:.3f} ms  speedup {tvl/tvf:.2f}x", flush=True)
    assert ve < 0.25, ve

# --- 2.77 fused nearest-2x upsample + conv (VAE ups / SwinIR tail, bs4) ---
for hl, cin, cout, act in [(256, 256, 256, None), (128, 512, 512, None),
                           (256, 64, 64, "lrelu")]:
    if _gnc._ups_plan(hl * 2, hl * 2, cin, cout) is None:
        print(f"ups_conv {hl}->{hl*2} {cin}->{cout}: UNSUPPORTED", flush=True)
        continue
    xu = jax.random.normal(jax.random.PRNGKey(41), (4, hl, hl, cin),
                           jnp.bfloat16)
    wu = jnp.asarray(_np.random.default_rng(42).standard_normal(
        (3, 3, cin, cout)) * 0.02, jnp.float32)
    bu = jnp.asarray(_np.random.default_rng(43).standard_normal(cout) * 0.05,
                     jnp.float32)
    fu = jax.jit(lambda *a: _gnc.upsample_conv(*a, act)).lower(
        xu, wu, bu).compile()
    fru = jax.jit(lambda *a: _gnc._ups_ref(*a, act)).lower(
        xu, wu, bu).compile()
    ou = fu(xu, wu, bu); ru = fru(xu, wu, bu)
    ue = float(jnp.abs(ou.astype(jnp.float32) - ru.astype(jnp.float32)).max())
    tu = _tc(fu, xu, wu, bu, iters=10) * 1e3
    tru = _tc(fru, xu, wu, bu, iters=10) * 1e3
    print(f"ups_conv {hl}->{hl*2} {cin}->{cout} act={act}: err={ue:.4f} "
          f"pallas {tu:.3f} ms  xla {tru:.3f} ms  speedup {tru/tu:.2f}x",
          flush=True)
    assert ue < 0.25, ue

# --- 2.8 cost-analysis cross-check: pallas flops visible to XLA? ---
def _fl(compiled):
    cost = compiled.cost_analysis()
    if isinstance(cost, list): cost = cost[0] if cost else {}
    return float(cost.get("flops", 0.0))
fk2 = jax.jit(lambda *a: _geglu.geglu_proj(*a)).lower(xg, whg, wgg, bhg, bgg).compile()
fr2 = jax.jit(lambda *a: _geglu._ref(*a)).lower(xg, whg, wgg, bhg, bgg).compile()
print(f"cost-analysis flops: pallas {_fl(fk2):.3e}  xla-ref {_fl(fr2):.3e}", flush=True)

# --- 3. fused SwinIR ---
from edtr_tpu.models.swinir import SwinIR
from edtr_tpu.utils.benchtime import timeit_chained
BATCH = 8
xs = jax.random.uniform(jax.random.PRNGKey(0), (BATCH, 512, 512, 3))
kw = dict(img_size=64, embed_dim=180, depths=(6,)*8, num_heads=(6,)*8,
          window_size=8, mlp_ratio=2.0, sf=8, upsampler="nearest+conv",
          unshuffle=True, unshuffle_scale=8, dtype=jnp.bfloat16)
net_f = SwinIR(fused=True, **kw); net_l = SwinIR(fused=False, **kw)
params = jax.jit(net_l.init)(jax.random.PRNGKey(1), xs[:1])
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)
t0 = time.time()
f_fused = jax.jit(lambda p, v: net_f.apply(p, v)).lower(params, xs).compile()
print(f"fused swinir compiled {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
f_leg = jax.jit(lambda p, v: net_l.apply(p, v)).lower(params, xs).compile()
print(f"legacy swinir compiled {time.time()-t0:.1f}s", flush=True)
of = f_fused(params, xs); ol = f_leg(params, xs)
err = float(jnp.abs(of.astype(jnp.float32) - ol.astype(jnp.float32)).max())
print(f"swinir fused numerics: max_abs_err={err:.5f}", flush=True)
assert err < 0.05, err
ms_f = timeit_chained(f_fused, params, xs, iters=20) * 1e3
ms_l = timeit_chained(f_leg, params, xs, iters=20) * 1e3
print(json.dumps({"swinir_fused_ms_per_img": round(ms_f/BATCH, 3),
                  "swinir_legacy_ms_per_img": round(ms_l/BATCH, 3),
                  "speedup": round(ms_l/ms_f, 3)}), flush=True)
print("ALL CHIP CHECKS PASSED", flush=True)
