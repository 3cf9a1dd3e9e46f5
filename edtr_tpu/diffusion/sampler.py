"""Spaced DDPM sampler compiled as a single ``lax.scan``.

TPU-first re-design of the reference ``SpacedSampler``
(``utils/sampler.py:67-323`` in /root/reference):

* ``make_schedule`` runs once on host (float64 numpy) and freezes the spaced
  posterior tables into a :class:`SpacedSchedule` pytree;
* the K-step denoising loop (the reference's Python ``for`` over timesteps,
  ``utils/sampler.py:252-257`` / ``:310-315``) becomes one ``jax.lax.scan``
  over stacked ``(t, index)`` pairs, so the whole K-step graph (K UNet +
  ControlNet forwards, K posterior updates) is traced once and compiled into
  a single XLA executable per ``(K, H, W)``;
* classifier-free guidance is a *static* Python branch (the reference always
  runs cfg_scale=1 / uncond=None — see SURVEY.md §7 non-goals) so the
  compiled graph contains no dead second forward.

Latent-space tiled sampling (``utils/sampler.py:288-303``) lives in
``edtr_tpu.utils.tiling`` and wraps ``model_fn`` before it enters the scan.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from edtr_tpu.diffusion.schedule import extract, space_timesteps

ModelFn = Callable[[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]], jnp.ndarray]


@struct.dataclass
class SpacedSchedule:
    """Posterior tables restricted to a subset of timesteps.

    Parity: ``SpacedSampler.make_schedule`` (``utils/sampler.py:85-133``).
    """

    timesteps: jnp.ndarray  # ascending, int32, shape (num_steps,)
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray

    @property
    def num_steps(self) -> int:
        return self.timesteps.shape[0]

    def predict_xstart_from_eps(self, x_t, index, eps):
        nd = x_t.ndim
        return (
            extract(self.sqrt_recip_alphas_cumprod, index, nd) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, index, nd) * eps
        )

    def q_posterior_mean_variance(self, x_start, x_t, index):
        nd = x_t.ndim
        mean = (
            extract(self.posterior_mean_coef1, index, nd) * x_start
            + extract(self.posterior_mean_coef2, index, nd) * x_t
        )
        variance = extract(self.posterior_variance, index, nd)
        log_variance = extract(self.posterior_log_variance_clipped, index, nd)
        return mean, variance, log_variance


def make_spaced_schedule(
    original_betas: np.ndarray,
    num_steps: int,
    used_timesteps: Optional[Sequence[int]] = None,
) -> SpacedSchedule:
    """Host-side float64 spacing math; parity ``utils/sampler.py:85-133``."""
    original_alphas_cumprod = np.cumprod(1.0 - np.asarray(original_betas, np.float64))
    num_timesteps = len(original_betas)
    if used_timesteps is None:
        used_timesteps = space_timesteps(num_timesteps, str(num_steps))
    used = set(int(t) for t in used_timesteps)

    betas = []
    last_alpha_cumprod = 1.0
    for i, alpha_cumprod in enumerate(original_alphas_cumprod):
        if i in used:
            betas.append(1 - alpha_cumprod / last_alpha_cumprod)
            last_alpha_cumprod = alpha_cumprod
    assert len(betas) == num_steps, (len(betas), num_steps)
    timesteps = np.array(sorted(used), dtype=np.int32)

    betas = np.array(betas, dtype=np.float64)
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])
    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    if num_steps == 1:
        posterior_log_variance_clipped = np.array([-10.0])
    else:
        posterior_log_variance_clipped = np.log(
            np.append(posterior_variance[1], posterior_variance[1:])
        )
    f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
    return SpacedSchedule(
        timesteps=jnp.asarray(timesteps),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(posterior_log_variance_clipped),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
    )


def p_sample(
    model_fn: ModelFn,
    schedule: SpacedSchedule,
    x: jnp.ndarray,
    t: jnp.ndarray,
    index: jnp.ndarray,
    cond: Dict[str, jnp.ndarray],
    rng: jax.Array,
    uncond: Optional[Dict[str, jnp.ndarray]] = None,
    cfg_scale: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One posterior step; parity ``utils/sampler.py:184-204``."""
    if uncond is None or cfg_scale == 1.0:
        eps = model_fn(x, t, cond)
    else:
        eps_c = model_fn(x, t, cond)
        eps_u = model_fn(x, t, uncond)
        eps = eps_u + cfg_scale * (eps_c - eps_u)
    pred_x0 = schedule.predict_xstart_from_eps(x, index, eps)
    mean, variance, _ = schedule.q_posterior_mean_variance(pred_x0, x, index)
    noise = jax.random.normal(rng, x.shape, dtype=x.dtype)
    nonzero = (index != 0).astype(x.dtype).reshape((-1,) + (1,) * (x.ndim - 1))
    x_prev = mean + nonzero * jnp.sqrt(variance) * noise
    return x_prev, pred_x0


def _scan_unroll(num_steps: int) -> int:
    """Unroll factor for the sampler scan (``$EDTR_SCAN_UNROLL``; default 1).

    Fully unrolling a short chain (the flagship runs K=4) removes the
    while-loop overhead and lets XLA fuse each posterior update into the
    next step's input prep across the (former) iteration boundary. The
    loop-invariant cross-attention K/V projections are hoisted either way
    (HLO while-loop LICM moves invariant dots to the entry — verified on
    the compiled HLO). Ships rolled until the on-chip stage A/B shows the
    unrolled graph winning (round-4 dispatch discipline: no default flips
    without an e2e measurement); long chains (the 50-step DiffBIR-style
    path) should stay rolled regardless — a 50-body graph's compile-time
    blowup outweighs the per-step savings.
    """
    import os

    v = os.environ.get("EDTR_SCAN_UNROLL", "")
    if v:
        return max(1, min(int(v), num_steps))
    return 1


def scan_bodies_counted(num_steps: int, unroll: Optional[int] = None) -> int:
    """How many copies of the scan body XLA cost analysis sees.

    ``compiled.cost_analysis()`` counts a ``lax.scan`` body once per copy
    present in the HLO, regardless of trip count: a rolled scan contributes
    1x body flops, an unroll-``u`` scan contributes ``u`` copies in the main
    while body plus ``num_steps % u`` remainder iterations, and a fully
    unrolled scan contributes all ``num_steps`` (verified empirically on
    XLA:CPU for (n,u) in {(4,1),(4,2),(4,4),(5,2),(6,4),(4,3)}, and on the
    REAL TPU backend for the same configs plus (50,1) —
    tools/check_scan_bodies_tpu.py, archived green in
    results/chip_queue/check_scan_bodies.log; ADVICE r4 #3). Benchmarks
    that scale cost-analysis flops by trip count must divide by this first —
    round-3's 4-step scan MFU was *under*counted rolled, and an unrolled
    default would have *over*counted it 4x (the 1.17 "MFU" in
    results/chip_queue/bench_r4_defaults.log).
    """
    u = _scan_unroll(num_steps) if unroll is None else max(
        1, min(unroll, num_steps))
    if u >= num_steps:
        return num_steps
    return u + num_steps % u


def sample_scan(
    model_fn: ModelFn,
    schedule: SpacedSchedule,
    x_T: jnp.ndarray,
    cond: Dict[str, jnp.ndarray],
    rng: jax.Array,
    uncond: Optional[Dict[str, jnp.ndarray]] = None,
    cfg_scale: float = 1.0,
    return_intermediates: bool = False,
    unroll: Optional[int] = None,
):
    """Walk the spaced timesteps in reverse under one ``lax.scan``.

    Parity: ``manual_sample_with_timesteps`` (``utils/sampler.py:267-323``)
    when ``x_T`` is a partially-noised latent, and ``sample``
    (``utils/sampler.py:206-265``) when ``x_T`` is pure noise.
    """
    n = schedule.num_steps
    batch = x_T.shape[0]
    ts = jnp.flip(schedule.timesteps)           # e.g. [200, 150, 100, 50]
    indices = jnp.arange(n - 1, -1, -1, dtype=jnp.int32)

    def step(carry, inp):
        x, key = carry
        t_scalar, index_scalar = inp
        key, sub = jax.random.split(key)
        t = jnp.full((batch,), t_scalar, dtype=jnp.int32)
        index = jnp.full((batch,), index_scalar, dtype=jnp.int32)
        x_prev, pred_x0 = p_sample(
            model_fn, schedule, x, t, index, cond, sub, uncond, cfg_scale
        )
        return (x_prev, key), (pred_x0 if return_intermediates else None)

    (img, _), inter = jax.lax.scan(
        step, (x_T, rng), (ts, indices),
        unroll=_scan_unroll(n) if unroll is None else unroll)
    if return_intermediates:
        return img, inter
    return img


class SpacedSampler:
    """Stateful convenience wrapper mirroring the reference class surface.

    Holds the original full-process betas and exposes ``sample`` /
    ``manual_sample_with_timesteps`` with the reference argument shapes.
    The device/tqdm/tiling plumbing of the torch version is replaced by
    jit-compiled scans; tiling is applied by wrapping ``model_fn`` (see
    ``edtr_tpu.utils.tiling.tiled_model_fn``).
    """

    def __init__(self, betas: np.ndarray):
        self.original_betas = np.asarray(betas, dtype=np.float64)
        self.num_timesteps = len(betas)
        self._cache: Dict[Tuple, SpacedSchedule] = {}

    def make_schedule(self, num_steps: int, used_timesteps=None) -> SpacedSchedule:
        key = (num_steps, tuple(sorted(used_timesteps)) if used_timesteps else None)
        if key not in self._cache:
            self._cache[key] = make_spaced_schedule(
                self.original_betas, num_steps, used_timesteps
            )
        return self._cache[key]

    def sample(
        self,
        model_fn: ModelFn,
        steps: int,
        x_size: Tuple[int, ...],
        cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
        batch_size: int = 1,
        x_T: Optional[jnp.ndarray] = None,
        uncond=None,
        cfg_scale: float = 1.0,
        return_intermediates: bool = False,
    ):
        schedule = self.make_schedule(steps)
        if x_T is None:
            rng, sub = jax.random.split(rng)
            x_T = jax.random.normal(sub, (batch_size,) + tuple(x_size), dtype=jnp.float32)
        return sample_scan(
            model_fn, schedule, x_T, cond, rng, uncond, cfg_scale, return_intermediates
        )

    def manual_sample_with_timesteps(
        self,
        model_fn: ModelFn,
        x_T: jnp.ndarray,
        steps: int,
        used_timesteps: Sequence[int],
        cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
        uncond=None,
        cfg_scale: float = 1.0,
        return_intermediates: bool = False,
    ):
        schedule = self.make_schedule(steps, used_timesteps)
        return sample_scan(
            model_fn, schedule, x_T, cond, rng, uncond, cfg_scale, return_intermediates
        )
