"""Loss functions.

Rebuilds the reference losses with their exact reductions:
  * ``elbo_bce`` — summed BCE + analytic KLD (src/loss.py:11-20), but shape-
    generic (the reference hard-flattens to 784, an MNIST-only bug noted in
    SURVEY.md §8).
  * ``elbo_mse`` — summed MSE / batch + KL (src/loss.py:23-29).
  * ``vqvae_loss`` — the 3-term VQ-VAE objective (src/train.py:129-134):
    mean-reduced reconstruction + codebook + beta * commitment terms, with
    the stop-gradients placed exactly as ``.detach()`` in the reference.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def elbo_bce(recon_x, x, mu, logvar) -> jnp.ndarray:
    """Summed Bernoulli NLL + KL(q || N(0,1)); recon_x in (0,1)."""
    x = x.reshape(recon_x.shape)
    eps = 1e-7
    bce = -jnp.sum(
        x * jnp.log(recon_x + eps) + (1 - x) * jnp.log(1 - recon_x + eps)
    )
    kld = -0.5 * jnp.sum(1 + logvar - mu**2 - jnp.exp(logvar))
    return bce + kld


def elbo_mse(x_tilde, x, kl_d) -> jnp.ndarray:
    """Summed MSE / batch_size + KL (src/loss.py:23-29)."""
    loss_recons = jnp.sum((x_tilde - x) ** 2) / x.shape[0]
    return loss_recons + kl_d


def vqvae_loss(
    x_tilde, x, z_e, z_q, beta: float = 1.0
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """3-term VQ-VAE loss; returns (total, metrics dict).

    metrics carries the reference's logged quantities: recon / vq / commit
    terms plus their sum ``train_loss`` = recon + vq (train.py:138).
    """
    loss_recons = jnp.mean((x_tilde - x) ** 2)
    loss_vq = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
    loss_commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
    total = loss_recons + loss_vq + beta * loss_commit
    metrics = {
        "loss": total,
        "loss_recons": loss_recons,
        "loss_vq": loss_vq,
        "loss_commit": loss_commit,
        "train_loss": loss_recons + loss_vq,
    }
    return total, metrics


def codebook_perplexity(indices: jnp.ndarray, num_codes: int) -> jnp.ndarray:
    """exp(entropy) of the code usage distribution — the standard VQ health
    metric (not in the reference; SURVEY §5 observability gap)."""
    counts = jax.ops.segment_sum(
        jnp.ones_like(indices, jnp.float32).reshape(-1),
        indices.reshape(-1),
        num_segments=num_codes,
    )
    probs = counts / jnp.maximum(jnp.sum(counts), 1.0)
    entropy = -jnp.sum(jnp.where(probs > 0, probs * jnp.log(probs), 0.0))
    return jnp.exp(entropy)
