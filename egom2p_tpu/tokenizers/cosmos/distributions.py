"""Latent distributions for the continuous (CI/CV) tokenizers.

(reference: cosmos_tokenizer/modules/distributions.py:20-41).  Channels-last:
the Gaussian parameters are chunked along the trailing channel axis.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def identity_distribution(parameters):
    """AE formulation: the latent is the encoder output verbatim."""
    zero = jnp.zeros((1,), parameters.dtype)
    return parameters, (zero, zero)


def gaussian_distribution(parameters, rng=None, min_logvar: float = -30.0,
                          max_logvar: float = 20.0):
    """VAE formulation: sample from N(mean, var) via the reparameterization
    trick.  With rng=None returns the mean (deterministic eval)."""
    mean, logvar = jnp.split(parameters, 2, axis=-1)
    logvar = jnp.clip(logvar, min_logvar, max_logvar)
    if rng is None:
        return mean, (mean, logvar)
    std = jnp.exp(0.5 * logvar)
    sample = mean + std * jax.random.normal(rng, mean.shape, mean.dtype)
    return sample, (mean, logvar)
