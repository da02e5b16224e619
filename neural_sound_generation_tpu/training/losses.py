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


def hier_vqvae_loss(
    x_tilde, x, levels, beta: float = 1.0
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Two-level VQ-VAE loss: recon + per-level (vq + beta*commit).

    ``levels`` is a sequence of (z_e, z_q) pairs (top, bottom). Metrics
    mirror :func:`vqvae_loss` with per-level vq/commit terms summed.
    """
    loss_recons = jnp.mean((x_tilde - x) ** 2)
    loss_vq = 0.0
    loss_commit = 0.0
    metrics: Dict[str, jnp.ndarray] = {}
    for name, (z_e, z_q) in zip(("top", "bottom"), levels):
        lv = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        lc = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        loss_vq = loss_vq + lv
        loss_commit = loss_commit + lc
        metrics[f"loss_vq_{name}"] = lv
        metrics[f"loss_commit_{name}"] = lc
    total = loss_recons + loss_vq + beta * loss_commit
    metrics.update(
        loss=total,
        loss_recons=loss_recons,
        loss_vq=loss_vq,
        loss_commit=loss_commit,
        train_loss=loss_recons + loss_vq,
    )
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


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) lengths -> (B, max_len) float mask (util.py:231-243 semantics)."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


def masked_cross_entropy(
    logits: jnp.ndarray, targets: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Mean CE over valid positions (MaskedCrossEntropyLoss,
    dataloader.py:270-287 intent). logits (B, T, K), targets (B, T) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if lengths is None:
        return jnp.mean(nll)
    mask = sequence_mask(lengths, targets.shape[1])
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def discretized_mix_logistic_loss(
    y_hat: jnp.ndarray,
    y: jnp.ndarray,
    num_classes: int = 65536,
    log_scale_min: float = -32.23619130191664,
    lengths: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Discretized mixture-of-logistics NLL for scalar waveform outputs.

    The reference *calls* this through DiscretizedMixturelogisticLoss but
    never defines it (dataloader.py:289-307, SURVEY §8 dead path); this is
    the real implementation matching the configured interface
    (out_channels = 10 mixtures x 3 params, log_scale_min —
    src/hparams.py:50-55).

    y_hat: (B, T, 3*M) [logit_probs | means | log_scales]; y: (B, T) or
    (B, T, 1) in [-1, 1]. Returns mean NLL over valid positions.
    """
    if y.ndim == 3:
        y = y[..., 0]
    logit_probs, means, log_scales = jnp.split(y_hat, 3, axis=-1)
    log_scales = jnp.maximum(log_scales, log_scale_min)

    centered = y[..., None] - means  # (B, T, M)
    inv_std = jnp.exp(-log_scales)
    half_bin = 1.0 / (num_classes - 1)
    plus_in = inv_std * (centered + half_bin)
    min_in = inv_std * (centered - half_bin)
    cdf_plus = jax.nn.sigmoid(plus_in)
    cdf_min = jax.nn.sigmoid(min_in)

    # edge cases: 0 and num_classes-1 absorb the tails
    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)  # log sigmoid
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_std * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - jnp.log((num_classes - 1) / 2.0),
    )
    log_probs = jnp.where(
        y[..., None] < -0.999,
        log_cdf_plus,
        jnp.where(y[..., None] > 0.999, log_one_minus_cdf_min, inner),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    nll = -jax.nn.logsumexp(log_probs, axis=-1)  # (B, T)
    if lengths is None:
        return jnp.mean(nll)
    mask = sequence_mask(lengths, y.shape[1])
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def sample_from_discretized_mix_logistic(
    y_hat: jnp.ndarray, key, log_scale_min: float = -32.23619130191664
) -> jnp.ndarray:
    """Draw samples from a MoL output head; y_hat (..., 3*M) -> (...,)."""
    logit_probs, means, log_scales = jnp.split(y_hat, 3, axis=-1)
    k1, k2 = jax.random.split(key)
    comp = jax.random.categorical(k1, logit_probs, axis=-1)  # (...,)
    mean = jnp.take_along_axis(means, comp[..., None], axis=-1)[..., 0]
    log_scale = jnp.maximum(
        jnp.take_along_axis(log_scales, comp[..., None], axis=-1)[..., 0],
        log_scale_min,
    )
    u = jax.random.uniform(k2, mean.shape, minval=1e-5, maxval=1.0 - 1e-5)
    x = mean + jnp.exp(log_scale) * (jnp.log(u) - jnp.log1p(-u))
    return jnp.clip(x, -1.0, 1.0)
