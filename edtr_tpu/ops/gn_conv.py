"""Fused GroupNorm+SiLU+conv3x3 for the UNet/ControlNet ResBlocks (Pallas).

The denoise scan is ~52% of the flagship pipeline and its ResBlock convs
were measured ~54% MFU (tools/bench_resblock.py sizes the prize). In XLA
each ResBlock half round-trips the normalized activation through HBM:
GN-apply+SiLU writes h, the conv reads it back. This kernel keeps h in
VMEM: each image is DMA'd once into a zero-padded VMEM scratch, the folded
GN affine + SiLU is applied in place, and the 3x3 conv runs as 9 shifted
``(R, W, Cin) @ (Cin, cc)`` MXU matmuls with the conv bias, the ResBlock's
timestep-embedding add and the skip residual fused into the epilogue — the
normalized tensor and the pre-epilogue conv output never touch HBM.

GroupNorm statistics are computed OUTSIDE the kernel (``gn_fold``) with the
exact channel-sum formulation of ``models/layers.py:GroupNorm32`` (one
cheap XLA reduction pass over x); the kernel consumes the folded per-(B, C)
``mul``/``add``. This keeps the kernel's grid free of cross-tile stat
coupling and keeps fp32 numerics identical to the module path.

Backward is XLA recompute via ``jax.custom_vjp`` over the reference math
(the EDTR train step differentiates through the UNet/ControlNet); CPU and
unsupported shapes dispatch to the reference directly. Reference hot path:
``model/unet.py:203-223`` (ResBlock._forward) inside the sampler step graph
``utils/sampler.py:184-204`` (/root/reference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edtr_tpu.ops import dispatch

# test hook: force the Pallas path (interpret mode off-TPU)
_FORCE_KERNEL = False

# per-grid-cell VMEM budget (bytes); ~16 MB/core minus Mosaic overhead and
# the double-buffered block pipelines accounted in _plan_bytes
_BUDGET = 11 * 2 ** 20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def gn_stats(x, num_groups: int = 32):
    """Two-pass per-(B, G) fp32 GroupNorm moments ``(count, mean_g, var_g)``.

    Same channel-sum formulation as ``GroupNorm32`` (spatial-axis reductions
    keep C in the 128-lane minor dim; see the layout note there). Works for
    any trailing-channel layout with >=1 spatial axes.
    """
    b = x.shape[0]
    c = x.shape[-1]
    g = num_groups
    cg = c // g
    spatial_axes = tuple(range(1, x.ndim - 1))
    n_spatial = 1
    for a in spatial_axes:
        n_spatial *= x.shape[a]
    count = jnp.asarray(n_spatial * cg, jnp.float32)
    ch_sum = jnp.sum(x, axis=spatial_axes, dtype=jnp.float32)  # (B, C)
    mean_g = ch_sum.reshape(b, g, cg).sum(-1) / count          # (B, G)
    mean_bc = jnp.broadcast_to(
        mean_g[:, :, None], (b, g, cg)).reshape(
            (b,) + (1,) * len(spatial_axes) + (c,))
    diff = x.astype(jnp.float32) - mean_bc
    var_g = jnp.sum(diff * diff, axis=spatial_axes).reshape(
        b, g, cg).sum(-1) / count                              # (B, G)
    return count, mean_g, var_g


def fold_from_moments(mean_g, var_g, scale, bias, c: int,
                      eps: float = 1e-5):
    """Per-(B, C) fp32 ``(mul, add)`` from per-(B, G) moments + affine."""
    b, g = mean_g.shape
    cg = c // g
    inv_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.broadcast_to(mean_g[:, :, None], (b, g, cg)).reshape(b, c)
    inv_c = jnp.broadcast_to(inv_g[:, :, None], (b, g, cg)).reshape(b, c)
    mul = inv_c * scale[None, :]
    add = bias[None, :] - mean_c * mul
    return mul, add


def gn_fold(x, scale, bias, num_groups: int = 32, eps: float = 1e-5):
    """Fold GroupNorm into per-(B, C) fp32 ``(mul, add)`` so that
    ``x_f32 * mul + add`` equals the ``GroupNorm32`` module path bit-for-bit
    in fp32."""
    _, mean_g, var_g = gn_stats(x, num_groups)
    return fold_from_moments(mean_g, var_g, scale, bias, x.shape[-1], eps)


def _plan_bytes(h, w, cin, cout, r, cc, has_res, es):
    j = cout // cc
    hpad = (h + 2) * w * cin * es                       # persistent scratch
    wbytes = 9 * cin * cc * es * (2 if j > 1 else 1)    # blocked by j
    acc = r * w * cc * 4                                # f32 accumulator
    win = (r + 2) * (w + 2) * cin * es * 2              # padded window regs
    slab = r * w * cin * es                             # tap operand
    out = r * w * cc * es * 2                           # double-buffered
    res = r * w * cc * es * 2 if has_res else 0
    return hpad + wbytes + acc + win + slab + out + res


def _lanes_ok(cin: int, strict_lanes) -> bool:
    """TPU HBM buffers are physically (8,128)-tiled; the manual image DMA
    slices the channel (lane) dim, and Mosaic requires such slices
    128-aligned (measured on-chip: cin=320 rejected, 640 ok). Non-multiple
    shapes (UNet 320/960 levels, SwinIR's 64-ch tail) fall back to XLA.
    Interpret mode has no such restriction, so CPU tests may exercise small
    channels; pass ``strict_lanes=True`` to pin real-TPU behavior."""
    if strict_lanes is None:
        strict_lanes = not _interpret()
    return (cin % 128 == 0) or not strict_lanes


def _plan(h, w, cin, cout, has_res, es=2, strict_lanes=None):
    """Pick (rows-per-cell, out-channel block) or None if nothing fits."""
    if h < 4 or w < 4:
        return None
    if not _lanes_ok(cin, strict_lanes):
        return None
    # out-channel blocks are pipeline-copied along the lane dim: partial
    # blocks must be 128-aligned (cout=1280 with cc=160 was rejected
    # on-chip), so candidates are the 128-multiple divisors of cout,
    # largest first (fewer weight re-reads)
    ccs = [c for c in range(128, cout + 1, 128) if cout % c == 0][::-1]
    if not ccs:
        ccs = [cout]  # only the full (unsliced) block is legal
    for cc in ccs:
        r = h
        while r >= min(h, 8):
            if h % r == 0 and _plan_bytes(
                    h, w, cin, cout, r, cc, has_res, es) * 1.15 <= _BUDGET:
                return r, cc
            if r % 2 or r // 2 < 8:
                break
            r //= 2
    return None


# band tier: no whole-image scratch — stream (R+2)-row halo bands per cell
# through an explicitly double-buffered pair of slabs (cell r's copy is
# started by cell r-1, overlapping the HBM read with compute).
_BAND_BUDGET = 12.2 * 2 ** 20


def _band_enabled() -> bool:
    import os

    # separate kill-switch: a VMEM miss on a marginal band plan must not
    # cost the (independently probed) whole-image tier
    return os.environ.get("EDTR_GNCONV_BAND", "1") != "0"


def _band_bytes(h, w, cin, cout, r, cc, has_res, es):
    j = cout // cc
    band = 2 * (r + 2) * w * cin * es              # double-buffered slabs
    # transient f32 affine/silu value (the bf16 padded copy reuses the
    # tap-operand slab accounting below)
    win = (r + 2) * (w + 2) * cin * 4
    wbytes = 9 * cin * cc * es * (2 if j > 1 else 1)
    acc = r * w * cc * 4
    slab = r * w * cin * es
    out = r * w * cc * es * 2
    res = r * w * cc * es * 2 if has_res else 0
    return band + win + wbytes + acc + slab + out + res


def _band_plan(h, w, cin, cout, has_res, es=2, strict_lanes=None):
    """(rows, cc) for the streaming-band kernel, or None."""
    if h < 16:  # needs >=2 row blocks; small maps fit the whole-image tier
        return None
    if not _lanes_ok(cin, strict_lanes):
        return None
    if not _band_enabled():
        return None
    # 128-multiple divisors of cout, largest first (see _plan)
    ccs = [c for c in range(128, cout + 1, 128) if cout % c == 0][::-1]
    if not ccs:
        ccs = [cout]
    for cc in ccs:
        for r in (16, 8, 4):
            if h % r == 0 and h // r >= 2 and _band_bytes(
                    h, w, cin, cout, r, cc, has_res, es) * 1.1 \
                    <= _BAND_BUDGET:
                return r, cc
    return None


def supported(h: int, w: int, cin: int, cout: int,
              has_res: bool = True, strict_lanes=None) -> bool:
    return (_plan(h, w, cin, cout, has_res,
                  strict_lanes=strict_lanes) is not None
            or _band_plan(h, w, cin, cout, has_res,
                          strict_lanes=strict_lanes) is not None)


def will_fuse(h: int, w: int, cin: int, cout: int,
              has_res: bool = True, es: int = 2) -> bool:
    """True iff :func:`gn_silu_conv` takes a Pallas tier at this shape:
    a VMEM plan exists AND the measured dispatch table says the kernel
    wins there (ops/dispatch.py — r3 shipped 32'/8' shapes that measured
    0.65-0.70x vs XLA)."""
    if _FORCE_KERNEL:
        return supported(h, w, cin, cout, has_res, strict_lanes=False)
    if jax.default_backend() != "tpu":
        return False
    if not supported(h, w, cin, cout, has_res):
        return False
    return dispatch.decide("gn_conv", f"{h}x{w}x{cin}->{cout}",
                           h, w, cin, cout)


def will_fuse_ups(h2: int, w2: int, cin: int, cout: int,
                  es: int = 2) -> bool:
    """Dispatch for :func:`upsample_conv` (h2/w2 are OUTPUT sizes)."""
    if _FORCE_KERNEL:
        return _ups_plan(h2, w2, cin, cout, es,
                         strict_lanes=False) is not None
    if jax.default_backend() != "tpu":
        return False
    if _ups_plan(h2, w2, cin, cout, es) is None:
        return False
    return dispatch.decide("ups_conv", f"{h2}x{w2}x{cin}->{cout}",
                           h2, w2, cin, cout)


def _epilogue(acc, b_ref, emb_ref, res_ref, out_dtype):
    """bias/emb/residual adds in compute dtype — the exact legacy order
    (flax Conv adds its bias after casting; ResBlock adds emb and skip in
    the compute dtype)."""
    out = acc.astype(out_dtype) + b_ref[0][None, None, :].astype(out_dtype)
    if emb_ref is not None:
        out = out + emb_ref[0, 0][None, None, :].astype(out_dtype)
    if res_ref is not None:
        out = out + res_ref[0]
    return out


def _body(x_hbm, mul_ref, add_ref, w_ref, b_ref, emb_ref, res_ref,
          o_ref, hpad, sem, *, h, w, r_rows):
    # scratch layout: (h+2, w, cin) — row halos only. The DMA destination
    # may slice ONLY untiled leading dims (Mosaic requires memref slices
    # along the last two (tiled) dims to be tile-aligned); the conv's width
    # padding is synthesized per cell in registers via jnp.pad instead.
    bi = pl.program_id(0)
    j = pl.program_id(1)
    r = pl.program_id(2)

    @pl.when((j == 0) & (r == 0))
    def _prep():
        cp = pltpu.make_async_copy(x_hbm.at[bi], hpad.at[pl.ds(1, h)], sem)
        cp.start()
        cp.wait()
        hpad[0:1] = jnp.zeros_like(hpad[0:1])
        hpad[h + 1:h + 2] = jnp.zeros_like(hpad[h + 1:h + 2])
        xi = hpad[pl.ds(1, h)].astype(jnp.float32)
        a = xi * mul_ref[0, 0][None, None, :] + add_ref[0, 0][None, None, :]
        # cast-then-SiLU: matches GroupNorm32 (casts after affine) + silu.
        # The sigmoid itself runs in fp32 on the bf16-rounded value —
        # Mosaic's bf16 logistic lowering hits a vector.broadcast
        # element-type verifier bug (f32 -> vector<bf16>), and XLA upcasts
        # bf16 transcendentals internally anyway.
        ar = a.astype(hpad.dtype)
        hpad[pl.ds(1, h)] = jax.nn.silu(
            ar.astype(jnp.float32)).astype(hpad.dtype)

    cc = o_ref.shape[-1]
    win = hpad[pl.ds(r * r_rows, r_rows + 2)]        # (R+2, w, cin)
    wpad = jnp.pad(win, ((0, 0), (1, 1), (0, 0)))    # conv zero columns
    acc = jnp.zeros((r_rows, w, cc), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            slab = wpad[ky:ky + r_rows, kx:kx + w, :]
            acc = acc + jax.lax.dot_general(
                slab, w_ref[ky, kx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = _epilogue(acc, b_ref, emb_ref, res_ref, o_ref.dtype)


def _kernel_emb(x_hbm, mul_ref, add_ref, w_ref, b_ref, emb_ref,
                o_ref, hpad, sem, *, h, w, r_rows):
    _body(x_hbm, mul_ref, add_ref, w_ref, b_ref, emb_ref, None,
          o_ref, hpad, sem, h=h, w=w, r_rows=r_rows)


def _kernel_res(x_hbm, mul_ref, add_ref, w_ref, b_ref, res_ref,
                o_ref, hpad, sem, *, h, w, r_rows):
    _body(x_hbm, mul_ref, add_ref, w_ref, b_ref, None, res_ref,
          o_ref, hpad, sem, h=h, w=w, r_rows=r_rows)


def _kernel_plain(x_hbm, mul_ref, add_ref, w_ref, b_ref,
                  o_ref, hpad, sem, *, h, w, r_rows):
    _body(x_hbm, mul_ref, add_ref, w_ref, b_ref, None, None,
          o_ref, hpad, sem, h=h, w=w, r_rows=r_rows)


def _kernel_emb_res(x_hbm, mul_ref, add_ref, w_ref, b_ref, emb_ref, res_ref,
                    o_ref, hpad, sem, *, h, w, r_rows):
    _body(x_hbm, mul_ref, add_ref, w_ref, b_ref, emb_ref, res_ref,
          o_ref, hpad, sem, h=h, w=w, r_rows=r_rows)


def _band_copy(x_hbm, bands, sems, bi, r, which, *, r_rows):
    """ONE copy descriptor for row-block ``r`` of image ``bi`` into slab
    buffer ``r % 2``: interior cells ("mid") pull R+2 rows (core + both
    halos); edge cells ("first"/"last") pull R+1 and leave the missing halo
    row to the post-affine zeroing. nr >= 2 (plan invariant) keeps branches
    exclusive. Built identically at start (prefetching cell) and wait
    (consuming cell) — the standard cross-cell double-buffer pattern.
    Constructing only the branch-taken descriptor (``which`` is trace-time
    static) keeps unused descriptors out of the trace — an unstarted
    descriptor logs an 'AsyncCopyDescriptor was not used' ERROR per trace
    (VERDICT r3 weak #5)."""
    r0 = r * r_rows
    band = bands.at[r % 2]
    sem = sems.at[r % 2]
    # destinations slice only the (untiled) row dim — see _body's note on
    # Mosaic's tile-alignment rule for memref slices
    if which == "mid":
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(r0 - 1, r_rows + 2)],
            band.at[pl.ds(0, r_rows + 2)], sem)
    if which == "first":
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(0, r_rows + 1)],
            band.at[pl.ds(1, r_rows + 1)], sem)
    assert which == "last"
    return pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(r0 - 1, r_rows + 1)],
        band.at[pl.ds(0, r_rows + 1)], sem)


def _band_body(x_hbm, mul_ref, add_ref, w_ref, b_ref, emb_ref, res_ref,
               o_ref, bands, sems, *, h, w, r_rows, nr):
    bi = pl.program_id(1)
    r = pl.program_id(2)
    mk = functools.partial(_band_copy, x_hbm, bands, sems, bi,
                           r_rows=r_rows)

    # cell r's copy was started by cell r-1 (intra-image prefetch, below);
    # only the first row block of each image self-loads
    @pl.when(r == 0)
    def _load_first():
        first = mk(r, "first")
        first.start()
        first.wait()

    @pl.when((r > 0) & (r < nr - 1))
    def _wait_mid():
        mk(r, "mid").wait()

    @pl.when(r == nr - 1)
    def _wait_last():
        mk(r, "last").wait()

    # start the NEXT row block's copy into the other slab buffer so the
    # HBM read overlaps this cell's compute
    @pl.when(r + 1 < nr)
    def _prefetch():
        @pl.when(r + 1 < nr - 1)
        def _pm():
            mk(r + 1, "mid").start()

        @pl.when(r + 1 == nr - 1)
        def _pl():
            mk(r + 1, "last").start()

    sl = bands[r % 2]                                # (R+2, w, cin)
    xi = sl.astype(jnp.float32)
    a = xi * mul_ref[0, 0][None, None, :] + add_ref[0, 0][None, None, :]
    # fp32 sigmoid on the bf16-rounded value (Mosaic bf16-logistic
    # verifier bug; see the whole-image tier note)
    s = jax.nn.silu(a.astype(sl.dtype).astype(jnp.float32))
    # edge halo rows must be conv ZEROS: slab row i holds global row
    # r*R - 1 + i; rows outside [0, h) are the missing halo (cell 0 row 0,
    # last cell row R+1 — which its edge copy also leaves unfilled)
    gi = r * r_rows - 1 + jax.lax.broadcasted_iota(
        jnp.int32, (r_rows + 2, 1, 1), 0)
    s = jnp.where((gi >= 0) & (gi < h), s, 0.0).astype(sl.dtype)
    band = jnp.pad(s, ((0, 0), (1, 1), (0, 0)))      # conv zero columns

    cc = o_ref.shape[-1]
    acc = jnp.zeros((r_rows, w, cc), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            slab = band[ky:ky + r_rows, kx:kx + w, :]
            acc = acc + jax.lax.dot_general(
                slab, w_ref[ky, kx], (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = _epilogue(acc, b_ref, emb_ref, res_ref, o_ref.dtype)


def _band_emb(x, m, a, wr, br, emb, o, band, sem, *, h, w, r_rows, nr):
    _band_body(x, m, a, wr, br, emb, None, o, band, sem,
               h=h, w=w, r_rows=r_rows, nr=nr)


def _band_res(x, m, a, wr, br, res, o, band, sem, *, h, w, r_rows, nr):
    _band_body(x, m, a, wr, br, None, res, o, band, sem,
               h=h, w=w, r_rows=r_rows, nr=nr)


def _band_plain(x, m, a, wr, br, o, band, sem, *, h, w, r_rows, nr):
    _band_body(x, m, a, wr, br, None, None, o, band, sem,
               h=h, w=w, r_rows=r_rows, nr=nr)


def _band_emb_res(x, m, a, wr, br, emb, res, o, band, sem,
                  *, h, w, r_rows, nr):
    _band_body(x, m, a, wr, br, emb, res, o, band, sem,
               h=h, w=w, r_rows=r_rows, nr=nr)


def _ref(x, mul, add, w, b, emb, res):
    """XLA reference: exact legacy-module math (affine in fp32, cast, SiLU,
    conv in compute dtype, bias/emb/res adds in compute dtype)."""
    cdtype = x.dtype
    a = x.astype(jnp.float32) * mul[:, None, None, :] + add[:, None, None, :]
    hh = jax.nn.silu(a.astype(cdtype))
    o = jax.lax.conv_general_dilated(
        hh, w.astype(cdtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    o = o + b.astype(cdtype)
    if emb is not None:
        o = o + emb[:, None, None, :].astype(cdtype)
    if res is not None:
        o = o + res
    return o


def _call(x, mul, add, w, b, emb, res):
    batch, h, wd, cin = x.shape
    cout = w.shape[-1]
    es = jnp.dtype(x.dtype).itemsize
    # tier preference: at h >= 16 the streaming-band kernel dominates the
    # whole-image one (same HBM traffic, smaller scratch, prefetch overlap,
    # usually a full-width N block); tiny maps (8²) keep the whole-image
    # tier (fewer rows resident than 2 slabs, larger M per dot)
    if not will_fuse(h, wd, cin, cout, res is not None, es):
        return _ref(x, mul, add, w, b, emb, res)
    plan = band = None
    if h >= 16:
        band = _band_plan(h, wd, cin, cout, res is not None, es)
        if band is None:
            plan = _plan(h, wd, cin, cout, res is not None, es)
    else:
        plan = _plan(h, wd, cin, cout, res is not None, es)
        if plan is None:
            band = _band_plan(h, wd, cin, cout, res is not None, es)
    if plan is None and band is None:  # pragma: no cover - will_fuse gates
        return _ref(x, mul, add, w, b, emb, res)
    if plan is None:
        return _band_call(x, mul, add, w, b, emb, res, band)
    r_rows, cc = plan
    cdtype = x.dtype
    jblk = cout // cc
    nr = h // r_rows
    grid = (batch, jblk, nr)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),                    # x (DMA src)
        # mul/add/emb ride as (B, 1, C) with (1, 1, C) blocks: a 2-D (1, C)
        # block over (B, C) breaks Mosaic's sublane rule (second-to-last
        # block dim must divide 8 or equal the array dim)
        pl.BlockSpec((1, 1, cin), lambda bi, j, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),                   # mul
        pl.BlockSpec((1, 1, cin), lambda bi, j, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),                   # add
        pl.BlockSpec((3, 3, cin, cc), lambda bi, j, r: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),                   # w
        pl.BlockSpec((1, cc), lambda bi, j, r: (0, j),
                     memory_space=pltpu.VMEM),                   # bias
    ]
    operands = [x, mul.reshape(batch, 1, cin), add.reshape(batch, 1, cin),
                w.astype(cdtype), b.reshape(1, cout)]
    if emb is not None and res is not None:
        kern = _kernel_emb_res
    elif emb is not None:
        kern = _kernel_emb
    elif res is not None:
        kern = _kernel_res
    else:
        kern = _kernel_plain
    if emb is not None:
        in_specs.append(pl.BlockSpec((1, 1, cc), lambda bi, j, r: (bi, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(emb.reshape(batch, 1, cout))
    if res is not None:
        in_specs.append(pl.BlockSpec(
            (1, r_rows, wd, cc), lambda bi, j, r: (bi, r, 0, j),
            memory_space=pltpu.VMEM))
        operands.append(res)

    return pl.pallas_call(
        functools.partial(kern, h=h, w=wd, r_rows=r_rows),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, r_rows, wd, cc), lambda bi, j, r: (bi, r, 0, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, wd, cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2, wd, cin), cdtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
        # declare the conv GEMM flops for XLA cost analysis (bench MFU)
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h * wd * 9 * cin * cout,
            bytes_accessed=(batch * h * wd
                            * (cin + cout * (2 if res is not None else 1))
                            * jnp.dtype(cdtype).itemsize
                            + 9 * cin * cout * 2 * max(jblk, 1)),
            transcendentals=batch * h * wd * cin,  # in-place SiLU sigmoid
        ),
    )(*operands)


def _band_call(x, mul, add, w, b, emb, res, plan):
    """Streaming-band variant: grid (j, b, r); each cell DMAs its own
    (R+2)-row halo band (re-read across j sweeps — j is 1 for every
    flagship shape this tier serves)."""
    batch, h, wd, cin = x.shape
    cout = w.shape[-1]
    r_rows, cc = plan
    cdtype = x.dtype
    jblk = cout // cc
    nr = h // r_rows
    grid = (jblk, batch, nr)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),                    # x (DMA src)
        # (B, 1, C) carriers — see the whole-image tier's sublane note
        pl.BlockSpec((1, 1, cin), lambda j, bi, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),                   # mul
        pl.BlockSpec((1, 1, cin), lambda j, bi, r: (bi, 0, 0),
                     memory_space=pltpu.VMEM),                   # add
        pl.BlockSpec((3, 3, cin, cc), lambda j, bi, r: (0, 0, 0, j),
                     memory_space=pltpu.VMEM),                   # w
        pl.BlockSpec((1, cc), lambda j, bi, r: (0, j),
                     memory_space=pltpu.VMEM),                   # bias
    ]
    operands = [x, mul.reshape(batch, 1, cin), add.reshape(batch, 1, cin),
                w.astype(cdtype), b.reshape(1, cout)]
    if emb is not None and res is not None:
        kern = _band_emb_res
    elif emb is not None:
        kern = _band_emb
    elif res is not None:
        kern = _band_res
    else:
        kern = _band_plain
    if emb is not None:
        in_specs.append(pl.BlockSpec((1, 1, cc), lambda j, bi, r: (bi, 0, j),
                                     memory_space=pltpu.VMEM))
        operands.append(emb.reshape(batch, 1, cout))
    if res is not None:
        in_specs.append(pl.BlockSpec(
            (1, r_rows, wd, cc), lambda j, bi, r: (bi, r, 0, j),
            memory_space=pltpu.VMEM))
        operands.append(res)

    return pl.pallas_call(
        functools.partial(kern, h=h, w=wd, r_rows=r_rows, nr=nr),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, r_rows, wd, cc), lambda j, bi, r: (bi, r, 0, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h, wd, cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((2, r_rows + 2, wd, cin), cdtype),  # double-buf
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h * wd * 9 * cin * cout,
            bytes_accessed=(batch * h * wd
                            * (cin * jblk
                               + cout * (2 if res is not None else 1))
                            * jnp.dtype(cdtype).itemsize
                            + 9 * cin * cout * 2 * max(jblk, 1)),
            transcendentals=batch * h * wd * cin * jblk,
        ),
    )(*operands)


# ---------------------------------------------------------------------------
# nearest-2x upsample + conv3x3 (VAE/UNet Upsample, SwinIR tail): the 4x
# upsampled tensor never touches HBM — each cell DMAs a (R/2+2)-row slab of
# the LOW-res image and synthesizes the padded hi-res band in VMEM
# (row-repeat on the untiled axis, width-repeat on sublanes).
# ---------------------------------------------------------------------------


def _ups_enabled() -> bool:
    import os

    return os.environ.get("EDTR_UPSCONV_FUSED", "1") != "0"


def _ups_bytes(h2, w2, cin, cout, r, cc, es):
    j = cout // cc
    slab = 2 * (r // 2 + 2) * (w2 // 2) * cin * es  # double-buffered low slabs
    band = (r + 2) * (w2 + 2) * cin * es            # synthesized value
    wbytes = 9 * cin * cc * es * (2 if j > 1 else 1)
    acc = r * w2 * cc * 4
    out = r * w2 * cc * es * 2
    return slab + band + wbytes + acc + out


def _ups_plan(h2, w2, cin, cout, es=2, strict_lanes=None):
    """(hi-res rows per cell, cc) for upsample_conv, or None.

    h2/w2 are the OUTPUT (2x) sizes; rows per cell must be even (each low
    row feeds two band rows) and >=2 row blocks must exist.
    """
    if not _ups_enabled() or h2 < 16 or w2 % 2 or h2 % 2:
        return None
    if not _lanes_ok(cin, strict_lanes):
        return None
    # 128-multiple divisors of cout, largest first (see _plan)
    ccs = [c for c in range(128, cout + 1, 128) if cout % c == 0][::-1]
    if not ccs:
        ccs = [cout]
    for cc in ccs:
        for r in (16, 8, 4):
            if h2 % r == 0 and h2 // r >= 2 and _ups_bytes(
                    h2, w2, cin, cout, r, cc, es) * 1.1 <= _BAND_BUDGET:
                return r, cc
    return None


def _ups_copy(x_hbm, slabs, sems, bi, r, which, *, rl, w2):
    """ONE copy descriptor for hi-res row-block ``r``: low rows
    [r*rl/... see _ups_kernel] into slab buffer ``r % 2``. ``which`` is
    trace-time static so unused descriptors never enter the trace (see
    :func:`_band_copy`)."""
    wl = w2 // 2
    rr = rl  # low rows per core block = r_rows // 2
    a0 = r * rr - 1
    slab = slabs.at[r % 2]
    sem = sems.at[r % 2]
    if which == "mid":
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(a0, rr + 2)],
            slab.at[pl.ds(0, rr + 2), 0:wl, :], sem)
    if which == "first":
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(0, rr + 1)],
            slab.at[pl.ds(1, rr + 1), 0:wl, :], sem)
    assert which == "last"
    return pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(a0, rr + 1)],
        slab.at[pl.ds(0, rr + 1), 0:wl, :], sem)


def _ups_act(o, act):
    if act == "lrelu":
        # torch nn.LeakyReLU(0.2) — the SwinIR nearest+conv tail
        return jax.nn.leaky_relu(o, negative_slope=0.2)
    return o


def _ups_act_kernel(o, act):
    """In-kernel activation: the compare runs in fp32 on the rounded value
    (Mosaic rejects bf16 vector cmpf on this target; lrelu is an exact
    rescale, so fp32-compute + round matches the bf16 path)."""
    if act == "lrelu":
        return jax.nn.leaky_relu(
            o.astype(jnp.float32), negative_slope=0.2).astype(o.dtype)
    return o


def _ups_kernel(x_hbm, w_ref, b_ref, o_ref, slabs, sems,
                *, h2, w2, r_rows, nr, act):
    bi = pl.program_id(1)
    r = pl.program_id(2)
    rl = r_rows // 2
    mk = functools.partial(_ups_copy, x_hbm, slabs, sems, bi, rl=rl, w2=w2)

    @pl.when(r == 0)
    def _load_first():
        first = mk(r, "first")
        first.start()
        first.wait()

    @pl.when((r > 0) & (r < nr - 1))
    def _wait_mid():
        mk(r, "mid").wait()

    @pl.when(r == nr - 1)
    def _wait_last():
        mk(r, "last").wait()

    @pl.when(r + 1 < nr)
    def _prefetch():
        @pl.when(r + 1 < nr - 1)
        def _pm():
            mk(r + 1, "mid").start()

        @pl.when(r + 1 == nr - 1)
        def _pl():
            mk(r + 1, "last").start()

    slab = slabs.at[r % 2]

    # rows not covered by the edge copies must read as conv zeros
    @pl.when(r == 0)
    def _z0():
        slab[0:1] = jnp.zeros_like(slab[0:1])

    @pl.when(r == nr - 1)
    def _z1():
        slab[rl + 1:rl + 2] = jnp.zeros_like(slab[rl + 1:rl + 2])

    sl = slab[...]                                   # (rl+2, wl, C)
    # hi-res band rows [r*R-1, r*R+R+1): up row u = low[u//2]; with the
    # slab holding low rows [r*rl-1, ...], the row pattern over the slab is
    # [0, 1, 1, 2, 2, ...] = repeat(slab, 2)[1 : R+3]
    rows = jnp.repeat(sl, 2, axis=0)[1:r_rows + 3]   # (R+2, wl, C)
    wide = jnp.repeat(rows, 2, axis=1)               # (R+2, w2, C)
    band = jnp.pad(wide, ((0, 0), (1, 1), (0, 0)))   # (R+2, w2+2, C)
    # the repeated edge rows duplicate the zero row correctly; the very
    # first band row at r==0 is up-row -1 (conv pad) = slab row 0 = zero ✓

    cc = o_ref.shape[-1]
    acc = jnp.zeros((r_rows, w2, cc), jnp.float32)
    for ky in range(3):
        for kx in range(3):
            acc = acc + jax.lax.dot_general(
                band[ky:ky + r_rows, kx:kx + w2, :], w_ref[ky, kx],
                (((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    o_ref[0] = _ups_act_kernel(
        acc.astype(o_ref.dtype)
        + b_ref[0][None, None, :].astype(o_ref.dtype), act)


def _ups_ref(x, w, b, act):
    cdtype = x.dtype
    bsz, hl, wl, c = x.shape
    up = jnp.broadcast_to(x[:, :, None, :, None, :],
                          (bsz, hl, 2, wl, 2, c)).reshape(
                              bsz, hl * 2, wl * 2, c)
    o = jax.lax.conv_general_dilated(
        up, w.astype(cdtype), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return _ups_act(o + b.astype(cdtype), act)


# Per-site subpixel defaults (round-5 interleaved same-process A/Bs,
# results/chip_queue/ab_subpix.json + ab_swinir_pad.json, v5e bs8 512^2,
# 3 rounds each, consistent across every round): the 4/9-MAC phase-folded
# formulation WINS the scan stage (UNet decoder upsamples: 36.71 vs
# 37.07 ms/img) and LOSES decode (16.77 vs 16.13) and the SwinIR tail
# (10.13 vs 9.70) — where the convs are bandwidth-bound the phase
# interleave relayout costs more than the MAC saving.
_SUBPIX_SITE_DEFAULT = {"unet": True, "vae": False, "swinir": False}


def _subpix_enabled(site=None) -> bool:
    """EDTR_UPS_SUBPIX: '0' off everywhere, '1'/'force' on everywhere,
    unset/'table' -> per-site measured default (_SUBPIX_SITE_DEFAULT)."""
    import os

    mode = os.environ.get("EDTR_UPS_SUBPIX", "table")
    if mode == "0":
        return False
    if mode in ("1", "force"):
        return True
    return _SUBPIX_SITE_DEFAULT.get(site, False)


def _fold_subpixel_weights(w):
    """(3, 3, cin, cout) fp32 -> (2, 2, cin, 4*cout) phase-folded taps.

    ``conv3x3(nearest2x(x))`` at hi-res phase (a, b) — output pixel
    (2i+a, 2j+b) — reads a 2-pixel-per-axis LOW-res neighborhood, because
    nearest duplication maps the three hi-res taps onto two lo-res pixels
    with one tap pair summed:

      rows  a=0: (w[0], w[1]+w[2])   a=1: (w[0]+w[1], w[2])
      cols  b=0: (k[:,0], k[:,1]+k[:,2])   b=1: (k[:,0]+k[:,1], k[:,2])

    Folds are fp32 sums of the original taps — exact up to one float
    reassociation per summed pair. Phase p = 2a+b occupies output
    channels [p*cout, (p+1)*cout).
    """
    w = w.astype(jnp.float32)
    rows = {0: jnp.stack([w[0], w[1] + w[2]]),       # (2, 3, cin, cout)
            1: jnp.stack([w[0] + w[1], w[2]])}
    phases = []
    for a in (0, 1):
        r = rows[a]
        for bb in (0, 1):
            if bb == 0:
                k = jnp.stack([r[:, 0], r[:, 1] + r[:, 2]], axis=1)
            else:
                k = jnp.stack([r[:, 0] + r[:, 1], r[:, 2]], axis=1)
            phases.append(k)                         # (2, 2, cin, cout)
    return jnp.concatenate(phases, axis=-1)          # (2, 2, cin, 4*cout)


def _ups_subpixel(x, w, b, act):
    """``conv3x3(nearest2x(x))`` computed at LOW resolution.

    One VALID 2x2 conv over the 1-padded lo-res input with the four
    phase-folded kernels (:func:`_fold_subpixel_weights`), then a phase
    interleave to (2H, 2W). vs the hi-res formulation: 16/36 = 4/9 the
    MACs, a 128-lane-aligned 4*cout output (the SwinIR tail's cout=64
    becomes 256), and the 2x nearest intermediate never exists. The
    interleave is the same byte volume as the output write.
    """
    cdtype = x.dtype
    bsz, hl, wl, cin = x.shape
    cout = w.shape[-1]
    w4 = _fold_subpixel_weights(w).astype(cdtype)
    z = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    o = jax.lax.conv_general_dilated(
        z, w4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))  # (B, hl+1, wl+1, 4*cout)
    o = _ups_act(o + jnp.tile(b.astype(cdtype), 4), act)
    # phase (a, b): spatial window offset a/b, channel block 2a+b
    ph = [o[:, a:hl + a, bb:wl + bb,
            (2 * a + bb) * cout:(2 * a + bb + 1) * cout]
          for a in (0, 1) for bb in (0, 1)]
    y = jnp.stack([jnp.stack(ph[0:2], axis=3),       # a=0: cols phase axis
                   jnp.stack(ph[2:4], axis=3)], axis=2)
    return y.reshape(bsz, hl * 2, wl * 2, cout)      # rows 2i+a, cols 2j+b


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def upsample_conv(x, w, b, act=None, site=None):
    """``act(conv3x3(nearest_upsample_2x(x)) + b)`` (NHWC, pad 1).

    Parity: ``Upsample`` blocks (reference ``model/vae.py:87-94`` /
    ``model/unet.py:50-79``) and the SwinIR nearest+conv tail
    (``model/swinir.py:856-894``, ``act="lrelu"`` = LeakyReLU(0.2)).

    ``site`` ("unet" | "vae" | "swinir" | None) picks the measured
    per-site subpixel default (_SUBPIX_SITE_DEFAULT above).

    Args:
      x: (B, H, W, C) LOW-res input in compute dtype.
      w: (3, 3, C, Cout) fp32 HWIO kernel; b: (Cout,) fp32 bias.
      act: None or "lrelu" (applied in compute dtype, epilogue-fused).
    Returns:
      (B, 2H, 2W, Cout) in x.dtype.
    """
    batch, hl, wl, cin = x.shape
    cout = w.shape[-1]
    es = jnp.dtype(x.dtype).itemsize
    if _subpix_enabled(site):
        # low-res phase-folded formulation: 4/9 the MACs, lane-aligned
        # channels ($EDTR_UPS_SUBPIX; per-site table above)
        return _ups_subpixel(x, w, b, act)
    if not will_fuse_ups(hl * 2, wl * 2, cin, cout, es):
        return _ups_ref(x, w, b, act)
    plan = _ups_plan(hl * 2, wl * 2, cin, cout, es,
                     strict_lanes=False if _FORCE_KERNEL else None)
    r_rows, cc = plan
    cdtype = x.dtype
    h2, w2 = hl * 2, wl * 2
    jblk = cout // cc
    nr = h2 // r_rows
    return pl.pallas_call(
        functools.partial(_ups_kernel, h2=h2, w2=w2, r_rows=r_rows, nr=nr,
                          act=act),
        grid=(jblk, batch, nr),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                # x (DMA src)
            pl.BlockSpec((3, 3, cin, cc), lambda j, bi, r: (0, 0, 0, j),
                         memory_space=pltpu.VMEM),               # w
            pl.BlockSpec((1, cc), lambda j, bi, r: (0, j),
                         memory_space=pltpu.VMEM),               # bias
        ],
        out_specs=pl.BlockSpec(
            (1, r_rows, w2, cc), lambda j, bi, r: (bi, r, 0, j),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((batch, h2, w2, cout), cdtype),
        scratch_shapes=[
            pltpu.VMEM((2, r_rows // 2 + 2, wl, cin), cdtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * h2 * w2 * 9 * cin * cout,
            bytes_accessed=(batch * (hl * wl * cin * jblk
                                     + h2 * w2 * cout)
                            * jnp.dtype(cdtype).itemsize
                            + 9 * cin * cout * 2 * max(jblk, 1)),
            transcendentals=0,
        ),
    )(x, w.astype(cdtype), b.reshape(1, cout))


def _ups_fwd(x, w, b, act, site):
    return upsample_conv(x, w, b, act, site), (x, w, b)


def _ups_bwd(act, site, res, g):
    # identical math either way; the subpixel formulation carries its 4/9
    # MAC count into the transposed convs when the gate is on
    fwd = _ups_subpixel if _subpix_enabled(site) else _ups_ref
    _, vjp = jax.vjp(lambda *a: fwd(*a, act), *res)
    return vjp(g)


upsample_conv.defvjp(_ups_fwd, _ups_bwd)


@jax.custom_vjp
def gn_silu_conv(x, mul, add, w, b, emb, res):
    """``conv3x3(silu(x*mul + add)) + b [+ emb] [+ res]`` (NHWC, pad 1).

    Args:
      x: (B, H, W, Cin) compute dtype.
      mul/add: (B, Cin) fp32 folded GroupNorm affine from :func:`gn_fold`.
      w: (3, 3, Cin, Cout) fp32 HWIO kernel (cast to x.dtype for the MXU).
      b: (Cout,) fp32 conv bias.
      emb: optional (B, Cout) timestep-embedding projection (compute dtype).
      res: optional (B, H, W, Cout) residual added last (compute dtype).
    Returns:
      (B, H, W, Cout) in x.dtype.
    """
    return _call(x, mul, add, w, b, emb, res)


def _fwd(x, mul, add, w, b, emb, res):
    return gn_silu_conv(x, mul, add, w, b, emb, res), (
        x, mul, add, w, b, emb, res)


def _bwd(saved, g):
    x, mul, add, w, b, emb, res = saved
    live = [x, mul, add, w, b] + [t for t in (emb, res) if t is not None]

    def f(*args):
        a = list(args[:5])
        i = 5
        for t in (emb, res):
            if t is None:
                a.append(None)
            else:
                a.append(args[i])
                i += 1
        return _ref(*a)

    _, vjp = jax.vjp(f, *live)
    grads = list(vjp(g))
    out = grads[:5]
    i = 5
    for t in (emb, res):
        if t is None:
            out.append(None)
        else:
            out.append(grads[i])
            i += 1
    return tuple(out)


gn_silu_conv.defvjp(_fwd, _bwd)
