"""Diagonal Gaussian latent distribution (JAX).

Equivalent of the reference's ``DiagonalGaussianDistribution``
(``/root/reference/src/model/normal_kl_loss.py:24-102``), used both by
the VAE latent head and the optional Gaussian-KL training loss.
Channel-last: parameters are (B, H, W, 2C) with mean/logvar split along
the trailing axis (the reference splits dim=1 in NCHW).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class DiagonalGaussian(NamedTuple):
    mean: jax.Array
    logvar: jax.Array

    @classmethod
    def from_parameters(cls, parameters: jax.Array) -> "DiagonalGaussian":
        mean, logvar = jnp.split(parameters, 2, axis=-1)
        return cls(mean=mean, logvar=jnp.clip(logvar, -30.0, 20.0))

    @property
    def std(self) -> jax.Array:
        return jnp.exp(0.5 * self.logvar)

    @property
    def var(self) -> jax.Array:
        return jnp.exp(self.logvar)

    def sample(self, key: jax.Array) -> jax.Array:
        noise = jax.random.normal(key, self.mean.shape, dtype=self.mean.dtype)
        return self.mean + self.std * noise

    def mode(self) -> jax.Array:
        return self.mean

    def kl(self, other: Optional["DiagonalGaussian"] = None) -> jax.Array:
        """KL divergence summed over all non-batch axes
        (``normal_kl_loss.py:43-60``)."""
        axes = tuple(range(1, self.mean.ndim))
        if other is None:
            return 0.5 * jnp.sum(
                jnp.square(self.mean) + self.var - 1.0 - self.logvar, axis=axes
            )
        return 0.5 * jnp.sum(
            jnp.square(self.mean - other.mean) / other.var
            + self.var / other.var
            - 1.0
            - self.logvar
            + other.logvar,
            axis=axes,
        )

    def nll(self, sample: jax.Array) -> jax.Array:
        axes = tuple(range(1, self.mean.ndim))
        logtwopi = jnp.log(2.0 * jnp.pi)
        return 0.5 * jnp.sum(
            logtwopi + self.logvar + jnp.square(sample - self.mean) / self.var,
            axis=axes,
        )


def normal_kl(mean1, logvar1, mean2, logvar2):
    """Broadcasting KL between two gaussians
    (``normal_kl_loss.py:75-102``)."""
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + jnp.square(mean1 - mean2) * jnp.exp(-logvar2)
    )
