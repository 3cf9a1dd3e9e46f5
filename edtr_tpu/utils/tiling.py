"""Spatial tiling: the reference's "sequence parallelism" analog (SURVEY.md §5.7).

TPU re-design of three subsystems:

* :func:`make_tiled_fn` — Gaussian-blended sliding-window wrapper
  (``utils/common.py:367-427``). Tile coordinates are static given the input
  shape, so under ``jit`` the loop becomes a ``lax.scan`` over a stacked tile
  axis: one compile of the inner fn regardless of tile count, accumulation by
  ``dynamic_update_slice`` adds.
* :func:`tiled_model_fn` — latent-space tiled diffusion: wraps the ControlLDM
  eps-fn so each tile sees the matching slice of ``c_img``
  (``utils/sampler.py:288-303``).
* :func:`tiled_vae_encode` / :func:`tiled_vae_decode` — tiled VAE. The
  reference synchronizes GroupNorm statistics across tiles with a task-queue
  that pauses every tile at each norm (``utils/tilevae/tilevae.py:232-278``).
  On TPU, :func:`_gn_synced_tiles` reproduces that *global* GroupNorm sync as
  an on-device two-pass fixed point: pass 1 runs every tile and sows per-norm
  (count, sum, sumsq) via the ``gn_stats`` collection, the pixel-weighted
  global moments are aggregated across tiles, and pass 2 re-runs each tile
  with the aggregated moments injected through ``gn_moments`` — XLA-friendly
  (static shapes, no host round-trips). Halo padding (32 px encode / 11 px
  decode margins like VAEHook, ``utils/tilevae/tilevae.py:315``) bounds the
  remaining receptive-field error at tile seams.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=32)
def gaussian_weights(tile_width: int, tile_height: int) -> np.ndarray:
    """Gaussian contribution mask; parity ``utils/common.py:151-165``."""
    var = 0.01
    midpoint_x = (tile_width - 1) / 2
    x_probs = [
        math.exp(-(x - midpoint_x) ** 2 / (tile_width ** 2) / (2 * var))
        / math.sqrt(2 * math.pi * var)
        for x in range(tile_width)
    ]
    midpoint_y = tile_height / 2
    y_probs = [
        math.exp(-(y - midpoint_y) ** 2 / (tile_height ** 2) / (2 * var))
        / math.sqrt(2 * math.pi * var)
        for y in range(tile_height)
    ]
    return np.outer(y_probs, x_probs).astype(np.float32)


def sliding_windows(
    h: int, w: int, tile_size: int, tile_stride: int
) -> List[Tuple[int, int, int, int]]:
    """(hi, hi_end, wi, wi_end) coords; parity ``utils/common.py:351-364``."""
    hi_list = list(range(0, h - tile_size + 1, tile_stride))
    if (h - tile_size) % tile_stride != 0:
        hi_list.append(h - tile_size)
    wi_list = list(range(0, w - tile_size + 1, tile_stride))
    if (w - tile_size) % tile_stride != 0:
        wi_list.append(w - tile_size)
    return [
        (hi, hi + tile_size, wi, wi + tile_size) for hi in hi_list for wi in wi_list
    ]


def make_tiled_fn(
    fn: Callable[..., jnp.ndarray],
    size: int,
    stride: int,
    scale: int = 1,
    channel: Optional[int] = None,
    weight: str = "gaussian",
) -> Callable[..., jnp.ndarray]:
    """Wrap ``fn`` to process NHWC inputs in Gaussian-blended tiles.

    ``fn(x_tile, *args, hi=, hi_end=, wi=, wi_end=, **kwargs)`` receives the
    tile plus its coordinates (as Python ints — static under jit), mirroring
    the reference kwargs protocol so callers can slice auxiliary tensors.
    Output spatial dims scale by ``scale``; channels by ``channel`` if given.
    """

    def tiled_fn(x: jnp.ndarray, *args, **kwargs) -> jnp.ndarray:
        b, h, w, c = x.shape
        # auto-shrink oversized tiles (reference VAEHook parity)
        t_size, t_stride = size, stride
        if t_size > min(h, w):
            t_size = min(h, w)
            t_stride = max(min(t_stride, t_size * 3 // 4), 1)
        out_c = channel or c
        out = jnp.zeros((b, h * scale, w * scale, out_c), dtype=jnp.float32)
        count = jnp.zeros_like(out)
        ws = t_size * scale
        weights = (
            gaussian_weights(ws, ws)[None, :, :, None]
            if weight == "gaussian"
            else np.ones((1, ws, ws, 1), np.float32)
        )
        weights = jnp.asarray(weights)
        for hi, hi_end, wi, wi_end in sliding_windows(h, w, t_size, t_stride):
            x_tile = jax.lax.dynamic_slice(
                x, (0, hi, wi, 0), (b, t_size, t_size, c)
            )
            if args or kwargs:
                kwargs.update(dict(hi=hi, hi_end=hi_end, wi=wi, wi_end=wi_end))
            y = fn(x_tile, *args, **kwargs).astype(jnp.float32) * weights
            oh, ow = hi * scale, wi * scale
            out = jax.lax.dynamic_update_slice(
                out, jax.lax.dynamic_slice(out, (0, oh, ow, 0), y.shape) + y,
                (0, oh, ow, 0),
            )
            count = jax.lax.dynamic_update_slice(
                count,
                jax.lax.dynamic_slice(count, (0, oh, ow, 0), y.shape) + weights,
                (0, oh, ow, 0),
            )
        return out / count

    return tiled_fn


def tiled_model_fn(
    model_fn: Callable, tile_size: int, tile_stride: int
) -> Callable:
    """Latent-tiled diffusion eps-fn; parity ``utils/sampler.py:288-303``.

    Each latent tile runs the full ControlNet+UNet with the *matching slice*
    of the ``c_img`` hint; ``c_txt`` is shared.
    """

    def fn(x: jnp.ndarray, t: jnp.ndarray, cond: Dict[str, jnp.ndarray]):
        def tile_call(x_tile, t, cond, hi, hi_end, wi, wi_end):
            c_img = jax.lax.dynamic_slice(
                cond["c_img"],
                (0, hi, wi, 0),
                (cond["c_img"].shape[0], hi_end - hi, wi_end - wi, cond["c_img"].shape[-1]),
            )
            return model_fn(x_tile, t, {"c_txt": cond["c_txt"], "c_img": c_img})

        return make_tiled_fn(tile_call, tile_size, tile_stride)(x, t, cond)

    return fn


# -- tiled VAE with cross-tile GroupNorm synchronization -----------------------
#
# The reference's VAEHook pauses every tile at each GroupNorm and aggregates
# pixel-weighted var/mean across tiles via a host-side task queue
# (utils/tilevae/tilevae.py:232-278, 514-575). The TPU re-design is a
# fixed-point two-pass scheme (all on-device, static shapes):
#   pass 1 (stats): run non-overlapping tiles, each GroupNorm *sows* its
#     per-group (count, sum, sumsq) into the "gn_stats" collection;
#     aggregate across tiles -> exact global moments per layer.
#   pass 2 (apply): run overlapping (halo) tiles with the global moments
#     injected through the "gn_moments" collection; Gaussian-blend outputs.
# Iterating pass 1 with injected moments converges the stats to the
# untiled values (each iteration removes one layer of per-tile bias);
# `gn_sync_iters=2` is numerically indistinguishable in practice.

ENCODER_PAD = 32   # pixel halo, matches VAEHook encoder pad (tilevae.py:315)
DECODER_PAD = 11   # latent halo, matches VAEHook decoder pad


def _aggregate_gn_stats(tile_stats: List[Dict]) -> Dict:
    """Sum (count, sum, sumsq) leaves across tiles -> {"mean","var"} tree."""

    def is_leaf(node):
        return isinstance(node, dict) and "stats" in node

    def combine(nodes):
        out = {}
        for key in nodes[0]:
            subs = [n[key] for n in nodes]
            if is_leaf(nodes[0][key]) or not isinstance(nodes[0][key], dict):
                # leaf: {"stats": (count, sum, sumsq)} (sow wraps in tuple)
                vals = [s["stats"] if isinstance(s, dict) else s for s in subs]
                vals = [v[0] if isinstance(v, tuple) and len(v) == 1 and isinstance(v[0], tuple) else v for v in vals]
                total_c = sum(v[0] for v in vals)
                total_s = sum(v[1] for v in vals)
                total_ss = sum(v[2] for v in vals)
                mean = total_s / total_c
                var = total_ss / total_c - mean * mean
                out[key] = {"mean": mean, "var": jnp.maximum(var, 0.0)}
            else:
                out[key] = combine(subs)
        return out

    return combine(tile_stats)


def _gn_synced_tiles(
    apply_fn: Callable,
    x: jnp.ndarray,
    tile_size: int,
    stride: int,
    out_scale_num: int,
    out_scale_den: int,
    out_channels: int,
    gn_sync_iters: int = 1,
) -> jnp.ndarray:
    """Generic GN-synced tiled apply of an NHWC -> NHWC function.

    ``apply_fn(tile, moments, mutable) -> (out, state)``; output spatial size
    is ``tile * out_scale_num / out_scale_den``.
    """
    b, h, w, c = x.shape
    # auto-shrink oversized tiles to the input extent (the reference's
    # VAEHook does the same, utils/tilevae/tilevae.py:325-338) — e.g. the
    # demo's decoder tile default exceeds small latents
    if tile_size > min(h, w):
        tile_size = min(h, w)
        stride = max(min(stride, tile_size * 3 // 4), 1)
    sc = lambda v: v * out_scale_num // out_scale_den

    moments = None
    for _ in range(max(gn_sync_iters, 0)):
        stats = []
        for hi, hi_end, wi, wi_end in sliding_windows(h, w, tile_size, tile_size):
            tile = jax.lax.dynamic_slice(x, (0, hi, wi, 0), (b, tile_size, tile_size, c))
            _, state = apply_fn(tile, moments, ("gn_stats",))
            stats.append(state["gn_stats"])
        moments = _aggregate_gn_stats(stats)

    out = jnp.zeros((b, sc(h), sc(w), out_channels), jnp.float32)
    count = jnp.zeros_like(out)
    ws = sc(tile_size)
    weights = jnp.asarray(gaussian_weights(ws, ws)[None, :, :, None])
    for hi, hi_end, wi, wi_end in sliding_windows(h, w, tile_size, stride):
        tile = jax.lax.dynamic_slice(x, (0, hi, wi, 0), (b, tile_size, tile_size, c))
        y, _ = apply_fn(tile, moments, ())
        y = y.astype(jnp.float32) * weights
        oh, ow = sc(hi), sc(wi)
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (0, oh, ow, 0), y.shape) + y, (0, oh, ow, 0)
        )
        count = jax.lax.dynamic_update_slice(
            count,
            jax.lax.dynamic_slice(count, (0, oh, ow, 0), y.shape) + weights,
            (0, oh, ow, 0),
        )
    return out / count


def tiled_vae_encode(cldm, params, image: jnp.ndarray, tile_size: int,
                     gn_sync_iters: int = 1):
    """GN-synced tiled encode; returns the posterior distribution."""
    from edtr_tpu.models.distributions import DiagonalGaussianDistribution

    if tile_size <= 0:
        tile_size = 512

    def apply_fn(tile, moments, mutable):
        variables = {"params": params["vae"]}
        if moments is not None:
            variables["gn_moments"] = moments
        if mutable:
            out, state = cldm.vae.apply(
                variables, tile,
                method=lambda m, v: m.quant_conv(m.encoder(v)),
                mutable=list(mutable),
            )
            return out, dict(state)
        out = cldm.vae.apply(
            variables, tile, method=lambda m, v: m.quant_conv(m.encoder(v))
        )
        return out, {}

    moments_map = _gn_synced_tiles(
        apply_fn, image, tile_size, tile_size * 3 // 4,
        1, 8, 2 * cldm.vae.embed_dim, gn_sync_iters,
    )
    return DiagonalGaussianDistribution(moments_map)


def tiled_vae_decode(cldm, params, z: jnp.ndarray, tile_size: int,
                     gn_sync_iters: int = 1) -> jnp.ndarray:
    """GN-synced tiled decode of an (unscaled) latent."""
    if tile_size <= 0:
        tile_size = 64

    def apply_fn(tile, moments, mutable):
        variables = {"params": params["vae"]}
        if moments is not None:
            variables["gn_moments"] = moments
        if mutable:
            out, state = cldm.vae.apply(
                variables, tile, method=cldm.vae.decode, mutable=list(mutable)
            )
            return out, dict(state)
        return cldm.vae.apply(variables, tile, method=cldm.vae.decode), {}

    return _gn_synced_tiles(
        apply_fn, z, tile_size, tile_size * 3 // 4, 8, 1, 3, gn_sync_iters
    )
