"""Shared NN building blocks (NHWC, fp32-norm mixed precision).

TPU-native re-design of the reference helpers in ``model/util.py:98-196``:

* ``timestep_embedding`` — sinusoidal, [cos | sin] order (reference
  ``model/util.py:98-118``);
* ``GroupNorm32`` — GroupNorm always computed in fp32 then cast back, the
  TPU mixed-precision norm rule (reference ``model/util.py:161-163``);
* ``conv``/``dense`` factories with fp32 params and a configurable compute
  dtype (bf16 on TPU).

All spatial tensors are NHWC (TPU conv layout); the PyTorch->JAX converter
transposes OIHW conv kernels to HWIO.
"""

from __future__ import annotations

import math
from typing import Any, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal embeddings, ``[cos | sin]`` concat order.

    Parity: ``model/util.py:98-118``.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 and cast back to the input dtype.

    Matches torch ``nn.GroupNorm`` semantics (consecutive-channel groups) and
    the reference's fp32 forcing (``GroupNorm32``, ``model/util.py:161-163``).
    ``epsilon`` is 1e-5 for UNet norms (torch default) and 1e-6 for the
    VAE/SpatialTransformer ``Normalize`` (``model/attention.py:50-51``).

    ``fold=True`` returns the folded per-(B, C) fp32 ``(mul, add)`` instead
    of applying the norm — the fused GN+conv/GEMM paths (ops/gn_conv.py,
    ops/ln_matmul.py:affine_matmul) apply it inside their kernels. The
    param tree, the ``gn_stats`` sow and the ``gn_moments`` injection
    (tiled-VAE GroupNorm sync) are identical in both modes, and in fp32
    ``x*mul + add`` is bit-identical to the applied path.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    fold: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from edtr_tpu.ops.gn_conv import fold_from_moments, gn_stats

        orig_dtype = x.dtype
        b = x.shape[0]
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        # LAYOUT-CRITICAL: stats reduce over SPATIAL axes only, keeping C in
        # the 128-lane minor dim. The old (B, S, G, C/G) reshape put C/G
        # (4..40) in lanes — a forced relayout + ~3% lane utilization that
        # made the norm stat passes 41% of the whole restore executable
        # (778 convert_reduce fusions, 232 of 569 ms at bs8 512², r3 trace).
        # Per-group aggregation happens on the tiny (B, C) partials instead
        # (ops/gn_conv.py:gn_stats). Two-pass fp32 stats (no E[x²]-E[x]²
        # cancellation) over the RAW tile data — these feed the sow below
        # even when global moments are injected, so the tiled-VAE
        # fixed-point iteration keeps observing the actual tiles.
        count, mean_g, var_g = gn_stats(x, self.num_groups)

        if self.has_variable("gn_moments", "mean"):
            use_mean_g = self.get_variable("gn_moments", "mean")   # (B, G)
            use_var_g = self.get_variable("gn_moments", "var")
        else:
            use_mean_g, use_var_g = mean_g, var_g
        # tiled-VAE GroupNorm sync (utils/tilevae/tilevae.py:232-278 parity):
        # pass 1 sows per-group (count, sum, sumsq); pass 2 injects globally
        # aggregated moments through the "gn_moments" collection.
        self.sow(
            "gn_stats",
            "stats",
            (count, mean_g * count, (var_g + jnp.square(mean_g)) * count),
            reduce_fn=lambda a, b: b,
        )
        # fold the affine into the per-channel scale/shift so the apply is
        # one fused multiply-add over the NHWC tensor
        mul, add = fold_from_moments(
            use_mean_g, use_var_g, scale, bias, c, self.epsilon)
        if self.fold:
            return mul, add
        spatial = x.ndim - 2
        shape_bc = (b,) + (1,) * spatial + (c,)
        y = x.astype(jnp.float32) * mul.reshape(shape_bc) + add.reshape(shape_bc)
        return y.astype(orig_dtype)


class TorchBatchNorm(nn.Module):
    """BatchNorm with exact torch ``nn.BatchNorm2d`` train-mode semantics.

    Differences from ``flax.linen.BatchNorm`` that matter for golden parity
    with the reference detnets (``model/faster_rcnn.py:987-992`` builds FPN +
    box head with plain ``nn.BatchNorm2d``; the resnet50 backbone at ``:929``
    keeps torch's default norm):

    * running-stat update uses the UNBIASED batch variance (torch applies
      Bessel's n/(n-1) correction when writing ``running_var``) while
      normalization uses the biased variance;
    * ``momentum`` follows the torch convention (new = (1-m)*old + m*batch,
      default 0.1);
    * stats and the normalization arithmetic are fp32 regardless of the
      compute dtype.

    Variable layout matches ``nn.BatchNorm`` (``params/{scale,bias}``,
    ``batch_stats/{mean,var}``) so the torchvision checkpoint converters are
    unchanged. ``use_running_average=True`` reproduces eval mode (and is
    numerically identical to the previous always-frozen behavior).
    """

    use_running_average: bool = True
    momentum: float = 0.1  # torch convention
    epsilon: float = 1e-5
    dtype: Optional[Dtype] = None
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = self.dtype or x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), self.param_dtype)
        bias = self.param("bias", nn.initializers.zeros, (c,), self.param_dtype)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        if self.use_running_average:
            mean = ra_mean.value.astype(jnp.float32)
            var = ra_var.value.astype(jnp.float32)
        else:
            axes = tuple(range(x.ndim - 1))
            n = 1
            for a in axes:
                n *= x.shape[a]
            mean = jnp.mean(x.astype(jnp.float32), axis=axes)
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32) - mean.reshape((1,) * len(axes) + (c,))),
                axis=axes,
            )
            if not self.is_initializing():
                m = self.momentum
                unbiased = var * (n / max(n - 1, 1))
                ra_mean.value = (1 - m) * ra_mean.value.astype(jnp.float32) + m * mean
                ra_var.value = (1 - m) * ra_var.value.astype(jnp.float32) + m * unbiased
        inv = jax.lax.rsqrt(var + self.epsilon) * scale.astype(jnp.float32)
        y = (x.astype(jnp.float32) - mean) * inv + bias.astype(jnp.float32)
        return y.astype(orig_dtype)


class LNParams(nn.Module):
    """Declares LayerNorm's ``scale``/``bias`` leaves without applying the
    math — the fused Pallas paths (ops/ln_matmul.py, ops/swin_block.py,
    ops/geglu.py) normalize in-kernel. Param tree byte-identical to
    :class:`LayerNorm`."""

    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones, (self.dim,),
                           jnp.float32),
                self.param("bias", nn.initializers.zeros, (self.dim,),
                           jnp.float32))


class ConvParams(nn.Module):
    """Declares ``conv``'s kernel/bias leaves without applying the conv
    (the fused paths contract them in-kernel). Same names, shapes and
    initializers as :func:`conv`; returns ``(kernel HWIO, bias-or-None)``."""

    kh: int
    kw: int
    in_f: int
    out_f: int
    use_bias: bool = True
    zero: bool = False

    @nn.compact
    def __call__(self):
        init = (nn.initializers.zeros if self.zero
                else nn.initializers.lecun_normal())
        k = self.param("kernel", init, (self.kh, self.kw, self.in_f,
                                        self.out_f), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_f,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class DenseParams(nn.Module):
    """Declares ``dense``'s kernel/bias leaves without applying the GEMM
    (the fused paths contract them in-kernel). Same names, shapes and
    initializers as :func:`dense`; returns ``(kernel, bias-or-None)``."""

    in_f: int
    out_f: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (self.in_f, self.out_f), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros, (self.out_f,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class LayerNorm(nn.Module):
    """LayerNorm in fp32 (torch nn.LayerNorm semantics, eps=1e-5).

    ``stat_dim`` > 0 computes the statistics with divisor ``stat_dim``
    instead of the channel count — the lane-padding contract (SwinIR
    180->192): trailing channels are guaranteed-zero, so raw sums are
    unchanged and only the divisor differs (see ops/_norms.py:ln_f32).
    """

    epsilon: float = 1e-5
    stat_dim: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig_dtype = x.dtype
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.stat_dim and self.stat_dim != c:
            xf = x.astype(jnp.float32)
            n = float(self.stat_dim)
            mean = jnp.sum(xf, axis=-1, keepdims=True) / n
            var = jnp.sum(xf * xf, axis=-1, keepdims=True) / n - mean * mean
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            return (y * scale + bias).astype(orig_dtype)
        # consumers fuse their own f32 upcast (see GroupNorm32 note)
        mean = jnp.mean(x, axis=-1, keepdims=True, dtype=jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32) - mean),
                       axis=-1, keepdims=True)
        y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(orig_dtype)


def conv(
    features: int,
    kernel_size: Union[int, Tuple[int, int]] = 3,
    *,
    stride: int = 1,
    padding: Union[int, str] = 0,
    use_bias: bool = True,
    dtype: Optional[Dtype] = None,
    zero: bool = False,
    name: Optional[str] = None,
) -> nn.Conv:
    """NHWC conv with fp32 params; ``zero=True`` mirrors ``zero_module``."""
    ks = (
        (kernel_size, kernel_size)
        if isinstance(kernel_size, int)
        else tuple(kernel_size)
    )
    pad = padding
    if isinstance(pad, int):
        pad = [(pad, pad), (pad, pad)]
    return nn.Conv(
        features=features,
        kernel_size=ks,
        strides=(stride, stride),
        padding=pad,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=(
            nn.initializers.zeros if zero else nn.initializers.lecun_normal()
        ),
        name=name,
    )


def dense(
    features: int,
    *,
    use_bias: bool = True,
    dtype: Optional[Dtype] = None,
    zero: bool = False,
    name: Optional[str] = None,
) -> nn.Dense:
    return nn.Dense(
        features=features,
        use_bias=use_bias,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=(
            nn.initializers.zeros if zero else nn.initializers.lecun_normal()
        ),
        name=name,
    )


def silu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.silu(x)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))


def nearest_upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x upsample, NHWC (torch F.interpolate mode=nearest)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def remat(target, **kw):
    """``nn.remat`` with the rematerialization policy from
    ``$EDTR_REMAT_POLICY`` (read at trace time):

      full / unset  recompute everything in the backward (the r1-r4
                    behaviour; minimum HBM, max recompute — the reference's
                    CheckpointFunction semantics, model/util.py:35-95)
      dots          jax.checkpoint_policies.dots_saveable: matmul/conv
                    outputs are SAVED, elementwise/norms recomputed — trades
                    HBM for skipping the expensive MXU recomputes
      dots_nobatch  dots_with_no_batch_dims_saveable (saves contraction
                    results only — smaller than dots)

    The train-step A/B (tools/profile_train.py) measures these on chip;
    the shipped default stays 'full' until a measured win (round-4
    dispatch discipline).
    """
    import os

    name = os.environ.get("EDTR_REMAT_POLICY", "full")
    policy = {
        "full": None,
        "": None,
        "dots": jax.checkpoint_policies.dots_saveable,
        "dots_nobatch": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    }[name]
    if policy is not None:
        kw["policy"] = policy
    return nn.remat(target, **kw)
