"""Gaussian diffusion schedules and the EDTR one-call ``reverse``.

TPU-first re-design of the reference diffusion math
(``model/gaussian_diffusion.py:9-169`` in /root/reference):

* schedules are computed once on host in float64 numpy, then frozen into a
  `flax.struct` pytree of fp32 ``jnp`` buffers, so a `Diffusion` value can be
  passed straight through ``jax.jit`` boundaries (it is a static-shaped leaf
  container, not an ``nn.Module``);
* every method is a pure function of ``(self, arrays)`` — safe inside
  ``lax.scan`` / ``pjit``-compiled train steps;
* timestep gathers use ``jnp.take`` along the frozen 1-D coefficient tables
  (the XLA-friendly version of the reference's ``tensor.gather``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Set, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


def make_beta_schedule(
    schedule: str,
    n_timestep: int,
    linear_start: float = 1e-4,
    linear_end: float = 2e-2,
    cosine_s: float = 8e-3,
) -> np.ndarray:
    """Beta schedules; parity with ``model/gaussian_diffusion.py:9-31``.

    Computed in float64 to match the reference bit-for-bit at table level.
    """
    if schedule == "linear":
        betas = (
            np.linspace(
                linear_start ** 0.5, linear_end ** 0.5, n_timestep, dtype=np.float64
            )
            ** 2
        )
    elif schedule == "cosine":
        timesteps = np.arange(n_timestep + 1, dtype=np.float64) / n_timestep + cosine_s
        alphas = np.cos(timesteps / (1 + cosine_s) * np.pi / 2) ** 2
        alphas = alphas / alphas[0]
        betas = 1 - alphas[1:] / alphas[:-1]
        betas = np.clip(betas, a_min=0, a_max=0.999)
    elif schedule == "sqrt_linear":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64)
    elif schedule == "sqrt":
        betas = np.linspace(linear_start, linear_end, n_timestep, dtype=np.float64) ** 0.5
    else:
        raise ValueError(f"schedule '{schedule}' unknown.")
    return betas


def extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-sample coefficients and broadcast to an ``ndim`` tensor.

    Parity: ``extract_into_tensor`` (``model/gaussian_diffusion.py:34-37``).
    """
    out = jnp.take(table, t, axis=-1)
    return out.reshape(out.shape + (1,) * (ndim - 1))


def space_timesteps(num_timesteps: int, section_counts: Union[str, Sequence[int]]) -> Set[int]:
    """IDDPM timestep respacing; parity with ``utils/sampler.py:14-64``."""
    if isinstance(section_counts, str):
        if section_counts.startswith("ddim"):
            desired_count = int(section_counts[len("ddim"):])
            for i in range(1, num_timesteps):
                if len(range(0, num_timesteps, i)) == desired_count:
                    return set(range(0, num_timesteps, i))
            raise ValueError(
                f"cannot create exactly {num_timesteps} steps with an integer stride"
            )
        section_counts = [int(x) for x in section_counts.split(",")]
    size_per = num_timesteps // len(section_counts)
    extra = num_timesteps % len(section_counts)
    start_idx = 0
    all_steps = []
    for i, section_count in enumerate(section_counts):
        size = size_per + (1 if i < extra else 0)
        if size < section_count:
            raise ValueError(f"cannot divide section of {size} steps into {section_count}")
        if section_count <= 1:
            frac_stride = 1
        else:
            frac_stride = (size - 1) / (section_count - 1)
        cur_idx = 0.0
        taken_steps = []
        for _ in range(section_count):
            taken_steps.append(start_idx + round(cur_idx))
            cur_idx += frac_stride
        all_steps += taken_steps
        start_idx += size
    return set(all_steps)


def create_diffusion(**kwargs) -> "Diffusion":
    """Config-registry factory (``target: model.gaussian_diffusion.Diffusion``)."""
    return Diffusion.create(**kwargs)


@struct.dataclass
class Diffusion:
    """Frozen fp32 coefficient tables for a full diffusion process.

    Parity: ``Diffusion`` (``model/gaussian_diffusion.py:40-169``), minus the
    torch Module machinery — this is a plain pytree.
    """

    betas: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    num_timesteps: int = struct.field(pytree_node=False, default=1000)
    parameterization: str = struct.field(pytree_node=False, default="eps")
    loss_type: str = struct.field(pytree_node=False, default="l2")

    @classmethod
    def create(
        cls,
        timesteps: int = 1000,
        beta_schedule: str = "linear",
        loss_type: str = "l2",
        linear_start: float = 1e-4,
        linear_end: float = 2e-2,
        cosine_s: float = 8e-3,
        parameterization: str = "eps",
    ) -> "Diffusion":
        assert parameterization in ("eps", "x0", "v")
        betas = make_beta_schedule(
            beta_schedule, timesteps, linear_start=linear_start,
            linear_end=linear_end, cosine_s=cosine_s,
        )
        alphas_cumprod = np.cumprod(1.0 - betas, axis=0)
        f32 = lambda a: jnp.asarray(a, dtype=jnp.float32)
        return cls(
            betas=f32(betas),
            sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
            sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
            sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
            sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1)),
            num_timesteps=timesteps,
            parameterization=parameterization,
            loss_type=loss_type,
        )

    # -- forward process ----------------------------------------------------
    def q_sample(self, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        nd = x_start.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * x_start
            + extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * noise
        )

    def get_v(self, x: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        nd = x.ndim
        return (
            extract(self.sqrt_alphas_cumprod, t, nd) * noise
            - extract(self.sqrt_one_minus_alphas_cumprod, t, nd) * x
        )

    def predict_xstart_from_eps(self, x_t: jnp.ndarray, t: jnp.ndarray, eps: jnp.ndarray) -> jnp.ndarray:
        nd = x_t.ndim
        return (
            extract(self.sqrt_recip_alphas_cumprod, t, nd) * x_t
            - extract(self.sqrt_recipm1_alphas_cumprod, t, nd) * eps
        )

    def get_loss(self, pred: jnp.ndarray, target: jnp.ndarray, mean: bool = True) -> jnp.ndarray:
        if self.loss_type == "l1":
            loss = jnp.abs(target - pred)
        elif self.loss_type == "l2":
            loss = (target - pred) ** 2
        else:
            raise NotImplementedError(f"unknown loss type '{self.loss_type}'")
        return loss.mean() if mean else loss

    # -- training objectives --------------------------------------------------
    def p_losses(
        self,
        model_fn,
        x_start: jnp.ndarray,
        t: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        rng: jax.Array,
        return_predicted_x_start: bool = False,
    ):
        """Standard eps/x0/v objective; parity ``model/gaussian_diffusion.py:113-133``."""
        noise = jax.random.normal(rng, x_start.shape, dtype=x_start.dtype)
        x_noisy = self.q_sample(x_start, t, noise)
        model_output = model_fn(x_noisy, t, cond)
        if self.parameterization == "x0":
            target = x_start
        elif self.parameterization == "eps":
            target = noise
        elif self.parameterization == "v":
            target = self.get_v(x_start, noise, t)
        else:
            raise NotImplementedError(self.parameterization)
        loss_simple = self.get_loss(model_output, target, mean=False).mean()
        if return_predicted_x_start:
            return loss_simple, self.predict_xstart_from_eps(x_noisy, t, model_output)
        return loss_simple

    def reverse(
        self,
        model_fn,
        t: jnp.ndarray,
        x0: jnp.ndarray,
        cond: Dict[str, jnp.ndarray],
        rng: Optional[jax.Array] = None,
        noise: Optional[jnp.ndarray] = None,
        x_noisy: Optional[jnp.ndarray] = None,
    ) -> Dict[str, jnp.ndarray]:
        """EDTR's one-step noising+denoising used for the HLF loss.

        Parity: ``model/gaussian_diffusion.py:153-169``: q_sample to ``t``,
        one eps-prediction, closed-form x0 estimate.
        """
        assert self.parameterization == "eps"
        if x_noisy is None:
            if noise is None:
                noise = jax.random.normal(rng, x0.shape, dtype=x0.dtype)
            x_noisy = self.q_sample(x0, t, noise)
        model_output = model_fn(x_noisy, t, cond)
        return dict(
            x_noisy=x_noisy,
            x_pred=self.predict_xstart_from_eps(x_noisy, t, model_output),
            model_output=model_output,
        )
