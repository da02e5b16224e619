"""Convolutional VAE (reference ``VAE``, models.py:64-118) and the MLP
``DefaultVAE`` (models.py:35-61).

Encoder: Conv4x4/s2+BN+ReLU x2 -> Conv5x5/VALID+BN+ReLU -> Conv3x3/VALID
(2*z_dim channels)+BN, split into (mu, logvar).
Decoder: mirrored transpose convs, Tanh output.
KL is the analytic N(mu, sigma) || N(0, 1) divergence, summed over latent
channels and averaged over batch and spatial positions (matching
``kl_divergence(q, p).sum(1).mean()``, models.py:108-110).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.layers import (
    conv_down,
    conv_up,
    conv_kernel_init,
)


class VAE(nn.Module):
    input_dim: int = 1
    dim: int = 256
    z_dim: int = 128

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, train: bool = True
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        h = conv_down(self.dim)(x)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = conv_down(self.dim)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (5, 5), padding="VALID", kernel_init=conv_kernel_init)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.z_dim * 2, (3, 3), padding="VALID", kernel_init=conv_kernel_init
        )(h)
        h = nn.BatchNorm(use_running_average=not train)(h)

        mu, logvar = jnp.split(h, 2, axis=-1)

        # Analytic KL( N(mu, e^{logvar/2}) || N(0,1) ), per-position summed
        # over channels, averaged over batch and space (models.py:108-110).
        kl_per = 0.5 * (jnp.exp(logvar) + mu**2 - 1.0 - logvar)
        kl = jnp.mean(jnp.sum(kl_per, axis=-1))

        rng = self.make_rng("sample") if train else None
        if rng is not None:
            eps = jax.random.normal(rng, mu.shape, mu.dtype)
        else:
            eps = jnp.zeros_like(mu)
        z = mu + jnp.exp(0.5 * logvar) * eps

        h = nn.ConvTranspose(
            self.dim, (3, 3), padding="VALID", kernel_init=conv_kernel_init
        )(z)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.ConvTranspose(
            self.dim, (5, 5), padding="VALID", kernel_init=conv_kernel_init
        )(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = conv_up(self.dim)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = conv_up(self.input_dim)(h)
        x_tilde = nn.tanh(h)
        return x_tilde, kl


class DefaultVAE(nn.Module):
    """784 -> 400 -> 20 MLP VAE (models.py:35-61, the MNIST baseline)."""

    input_size: int = 784
    hidden: int = 400
    latent: int = 20

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True):
        x = x.reshape((x.shape[0], -1))
        h1 = nn.relu(nn.Dense(self.hidden)(x))
        mu = nn.Dense(self.latent)(h1)
        logvar = nn.Dense(self.latent)(h1)
        rng = self.make_rng("sample") if train else None
        eps = (
            jax.random.normal(rng, mu.shape, mu.dtype)
            if rng is not None
            else jnp.zeros_like(mu)
        )
        z = mu + jnp.exp(0.5 * logvar) * eps
        h3 = nn.relu(nn.Dense(self.hidden)(z))
        recon = nn.sigmoid(nn.Dense(self.input_size)(h3))
        return recon, mu, logvar
