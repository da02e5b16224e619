"""VQ-VAE: strided conv encoder -> vector-quantized codebook -> deconv decoder.

Capability parity with the reference ``VQVAE`` (models.py:161-216) plus the
speaker conditioning the reference configured (gin_channels,
``src/hparams.py:80-84``) but never wired into the model, and a continuous
feature-conditioning path completing the stubbed motion-driven decoder
(``src/inference.py:154-156``).

Architecture (for input (B, H, W, C)):
  encoder:  Conv4x4/s2 + BN + ReLU -> Conv4x4/s2 -> ResBlock x2   (H/4, W/4)
  codebook: z_dim codes of width `dim`, init U(-1/z_dim, 1/z_dim)
            (models.py:121-125), straight-through quantization
  decoder:  ResBlock x2 -> ReLU -> ConvT4x4/s2 + BN + ReLU -> ConvT4x4/s2
            -> Tanh
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from neural_sound_generation_tpu.models.layers import (
    ResBlock,
    conv_down,
    conv_up,
    conv_kernel_init,
    make_norm,
)
from neural_sound_generation_tpu.ops.vq import (
    codebook_lookup,
    residual_vq,
    vq,
    vq_st,
)


class Encoder(nn.Module):
    dim: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = conv_down(self.dim, dtype=self.dtype)(x)
        h = make_norm(self.norm, train, self.dtype)(h)
        h = nn.relu(h)
        h = conv_down(self.dim, dtype=self.dtype)(h)
        h = ResBlock(self.dim, dtype=self.dtype, norm=self.norm)(h, train)
        h = ResBlock(self.dim, dtype=self.dtype, norm=self.norm)(h, train)
        return h


class Decoder(nn.Module):
    dim: int
    output_dim: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = ResBlock(self.dim, dtype=self.dtype, norm=self.norm)(z, train)
        h = ResBlock(self.dim, dtype=self.dtype, norm=self.norm)(h, train)
        h = nn.relu(h)
        h = conv_up(self.dim, dtype=self.dtype)(h)
        h = make_norm(self.norm, train, self.dtype)(h)
        h = nn.relu(h)
        h = conv_up(self.output_dim, dtype=self.dtype)(h)
        return nn.tanh(h.astype(jnp.float32))


class VQVAE(nn.Module):
    """input_dim/dim/z_dim as in the reference ctor (models.py:162).

    ``n_speakers``/``gin_channels`` enable a learned speaker embedding
    added to the quantized latents before decoding (global conditioning —
    the multi-speaker CMU Arctic configuration).
    ``cond_features`` enables a linear projection of continuous features
    (e.g. PCA'd hand-joint angles) into the latent space, for
    motion-conditioned generation.
    """

    input_dim: int = 1
    dim: int = 256
    z_dim: int = 512  # number of codebook entries
    n_speakers: int = 0
    gin_channels: int = -1
    cond_features: int = 0
    # residual VQ stages (SoundStream-style); 1 = the reference's single
    # codebook. Codebook param becomes (num_quantizers, z_dim, dim).
    num_quantizers: int = 1
    # compute dtype for the conv stacks (bfloat16 doubles MXU throughput);
    # VQ distances and losses stay float32
    dtype: Any = jnp.float32
    # "batch" (reference parity) or "group" (per-sample stats — no
    # cross-replica coupling; SURVEY §7 hard part 4)
    norm: str = "batch"

    def setup(self):
        init = nn.initializers.uniform(scale=2.0 / self.z_dim)
        # codebook init U(-1/z_dim, 1/z_dim) (models.py:125); flax uniform
        # is [0, scale), so shift by -1/z_dim.
        cb_shape = (
            (self.z_dim, self.dim)
            if self.num_quantizers == 1
            else (self.num_quantizers, self.z_dim, self.dim)
        )
        self.codebook = self.param(
            "codebook",
            lambda key, shape: init(key, shape) - 1.0 / self.z_dim,
            cb_shape,
        )
        self.encoder = Encoder(self.dim, dtype=self.dtype, norm=self.norm)
        self.decoder = Decoder(
            self.dim, self.input_dim, dtype=self.dtype, norm=self.norm
        )
        if self.n_speakers > 0 and self.gin_channels > 0:
            self.speaker_embed = nn.Embed(self.n_speakers, self.gin_channels)
            self.speaker_proj = nn.Dense(self.dim, kernel_init=conv_kernel_init)
        if self.cond_features > 0:
            self.feature_proj = nn.Dense(self.dim, kernel_init=conv_kernel_init)

    def _condition(self, z, g=None, features=None):
        """Add global conditioning to latents (B, H', W', dim). Speaker
        ids are ignored when the model is unconditioned (gin<=0) — the
        WaveNet convention, so speaker-id-carrying corpora train
        unconditioned configs too."""
        if g is not None and self.n_speakers > 0 and self.gin_channels > 0:
            emb = self.speaker_proj(self.speaker_embed(g))  # (B, dim)
            z = z + emb[:, None, None, :]
        if features is not None:
            emb = self.feature_proj(features)  # (B, dim)
            z = z + emb[:, None, None, :]
        return z

    def encode(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """x (B, H, W, C) -> discrete code indices (B, H/4, W/4)
        (reference VQVAE.encode, models.py:188-191)."""
        z_e = self.encoder(x, train).astype(jnp.float32)
        if self.num_quantizers > 1:
            _, _, indices = residual_vq(z_e, self.codebook)
            return indices.reshape((self.num_quantizers,) + z_e.shape[:-1])
        return vq(z_e, self.codebook)

    def decode(
        self,
        indices: jnp.ndarray,
        g: Optional[jnp.ndarray] = None,
        features: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        """Code indices (B, H', W') — or (Q, B, H', W') for residual
        VQ — -> reconstruction (reference VQVAE.decode, models.py:193-196)."""
        if self.num_quantizers > 1:
            z_q = 0.0
            for q in range(self.num_quantizers):
                z_q = z_q + codebook_lookup(self.codebook[q], indices[q])
        else:
            z_q = codebook_lookup(self.codebook, indices)
        z_q = self._condition(z_q, g, features)
        return self.decoder(z_q, train)

    def decode_from_features(
        self, features: jnp.ndarray, latent_hw: Tuple[int, int], train: bool = False
    ) -> jnp.ndarray:
        """Continuous features (B, cond_features) -> audio frames, with the
        latent grid seeded from the projected features alone. This is the
        motion-conditioned generation path the reference stubbed out
        (src/inference.py:30-31, 154-156)."""
        emb = self.feature_proj(features)  # (B, dim)
        z = jnp.broadcast_to(
            emb[:, None, None, :],
            (features.shape[0], latent_hw[0], latent_hw[1], self.dim),
        )
        # snap to the nearest codebook entries so generation stays on the
        # learned discrete manifold
        if self.num_quantizers > 1:
            codes, _, _ = residual_vq(z, self.codebook)
        else:
            codes, _ = vq_st(z, self.codebook)
        return self.decoder(codes, train)

    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = True,
        g: Optional[jnp.ndarray] = None,
        features: Optional[jnp.ndarray] = None,
    ):
        """Returns (x_tilde, z_e, z_q) like the reference forward
        (models.py:198-216): ``z_e`` is the encoder output, ``z_q`` the
        codebook vectors selected via differentiable lookup (gradient path
        into the codebook), and the decoder consumes the straight-through
        codes."""
        z_e = self.encoder(x, train).astype(jnp.float32)
        if self.num_quantizers > 1:
            codes_st, z_q, _ = residual_vq(z_e, self.codebook)
        else:
            codes_st, indices = vq_st(z_e, self.codebook)
            # second, non-detached lookup: grads flow to the codebook
            z_q = codebook_lookup(self.codebook, indices).reshape(z_e.shape)
        h = self._condition(codes_st, g, features)
        x_tilde = self.decoder(h, train)
        return x_tilde, z_e, z_q
