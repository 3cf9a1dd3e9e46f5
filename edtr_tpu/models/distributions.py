"""Diagonal Gaussian posterior for the KL-VAE.

Parity: ``DiagonalGaussianDistribution`` (``model/distributions.py:24-65``).
Functional JAX version: sampling takes an explicit PRNG key; chunking is on
the channel-last axis (NHWC).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class DiagonalGaussianDistribution:
    def __init__(self, parameters: jnp.ndarray, deterministic: bool = False):
        self.parameters = parameters
        self.mean, self.logvar = jnp.split(parameters, 2, axis=-1)
        self.logvar = jnp.clip(self.logvar, -30.0, 20.0)
        self.deterministic = deterministic
        self.std = jnp.exp(0.5 * self.logvar)
        self.var = jnp.exp(self.logvar)
        if deterministic:
            self.var = self.std = jnp.zeros_like(self.mean)

    def sample(self, rng: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            rng, self.mean.shape, dtype=self.mean.dtype
        )

    def kl(self, other: "DiagonalGaussianDistribution" = None) -> jnp.ndarray:
        if self.deterministic:
            return jnp.array([0.0])
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                self.mean ** 2 + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            (self.mean - other.mean) ** 2 / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jnp.ndarray) -> jnp.ndarray:
        if self.deterministic:
            return jnp.array([0.0])
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = float(np.log(2.0 * np.pi))
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + (sample - self.mean) ** 2 / self.var,
            axis=axes,
        )

    def mode(self) -> jnp.ndarray:
        return self.mean
