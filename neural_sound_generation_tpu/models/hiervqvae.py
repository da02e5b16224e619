"""Hierarchical (two-level) VQ-VAE — VQ-VAE-2-style model family.

Beyond reference parity: the reference ships a single-level VQ-VAE
(src/models.py:161-216). This adds the standard two-level extension for
higher-fidelity reconstructions at the same codebook budget: a top code
grid at stride 8 captures global structure, a bottom grid at stride 4
(quantized *conditioned on the decoded top*) captures residual detail.

TPU notes: same NHWC / static-shape / straight-through machinery as the
flat model (ops/vq.py); both quantizations ride the fused Pallas
nearest-code kernel when shapes are lane-aligned. The bottom/top
codebooks shard over the 'model' mesh axis under tensor parallelism
(parallel/mesh.py rules).

A VQ-VAE-2 ancestral prior (top prior + top-conditioned bottom prior)
is a natural follow-up; GatedPixelCNN already supports class
conditioning and can be trained per level on the extracted code grids.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.layers import (
    ResBlock,
    conv_down,
    conv_kernel_init,
    conv_up,
    make_norm,
)
from neural_sound_generation_tpu.models.vqvae import Decoder, Encoder
from neural_sound_generation_tpu.ops.vq import codebook_lookup, vq_st


class TopEncoder(nn.Module):
    """Bottom features (stride 4) -> top features (stride 8)."""

    dim: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, h: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = conv_down(self.dim, dtype=self.dtype)(h)
        h = make_norm(self.norm, train, self.dtype)(h)
        h = nn.relu(h)
        h = ResBlock(self.dim, dtype=self.dtype, norm=self.norm)(h, train)
        return h


class TopDecoder(nn.Module):
    """Quantized top codes (stride 8) -> bottom resolution (stride 4)."""

    dim: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, z: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = ResBlock(self.dim, dtype=self.dtype, norm=self.norm)(z, train)
        h = nn.relu(h)
        return conv_up(self.dim, dtype=self.dtype)(h)


class HierVQVAE(nn.Module):
    """Two-level VQ-VAE. ``z_dim`` is the bottom codebook size;
    ``z_dim_top`` defaults to it."""

    input_dim: int = 1
    dim: int = 256
    z_dim: int = 512
    z_dim_top: int = 0
    dtype: Any = jnp.float32
    norm: str = "batch"

    @property
    def k_top(self) -> int:
        return self.z_dim_top or self.z_dim

    def setup(self):
        def cb_init(k):
            init = nn.initializers.uniform(scale=2.0 / k)
            return lambda key, shape: init(key, shape) - 1.0 / k

        self.codebook_top = self.param(
            "codebook_top", cb_init(self.k_top), (self.k_top, self.dim)
        )
        self.codebook_bottom = self.param(
            "codebook_bottom", cb_init(self.z_dim), (self.z_dim, self.dim)
        )
        self.enc_bottom = Encoder(self.dim, dtype=self.dtype, norm=self.norm)
        self.enc_top = TopEncoder(self.dim, dtype=self.dtype, norm=self.norm)
        self.dec_top = TopDecoder(self.dim, dtype=self.dtype, norm=self.norm)
        # merge encoder features with the decoded top before bottom VQ
        self.bottom_merge = nn.Conv(
            self.dim, (1, 1), kernel_init=conv_kernel_init, dtype=self.dtype,
            name="bottom_merge",
        )
        # merge both quantized levels before the final decoder
        self.decode_merge = nn.Conv(
            self.dim, (1, 1), kernel_init=conv_kernel_init, dtype=self.dtype,
            name="decode_merge",
        )
        self.decoder = Decoder(
            self.dim, self.input_dim, dtype=self.dtype, norm=self.norm
        )

    # -- quantization helpers ---------------------------------------------
    def _quantize(self, z_e, codebook):
        st, indices = vq_st(z_e, codebook)
        z_q = codebook_lookup(codebook, indices).reshape(z_e.shape)
        return st, z_q, indices.reshape(z_e.shape[:-1])

    def _levels(self, x, train):
        h_b = self.enc_bottom(x, train).astype(jnp.float32)
        z_e_t = self.enc_top(h_b, train).astype(jnp.float32)
        st_t, z_q_t, idx_t = self._quantize(z_e_t, self.codebook_top)
        dec_t = self.dec_top(st_t, train).astype(jnp.float32)
        z_e_b = self.bottom_merge(
            jnp.concatenate([h_b, dec_t], axis=-1)
        ).astype(jnp.float32)
        st_b, z_q_b, idx_b = self._quantize(z_e_b, self.codebook_bottom)
        return (st_t, z_e_t, z_q_t, idx_t, dec_t), (st_b, z_e_b, z_q_b, idx_b)

    def _decode_sts(self, st_t_decoded, st_b, train):
        h = self.decode_merge(jnp.concatenate([st_b, st_t_decoded], axis=-1))
        return self.decoder(h, train)

    # -- public API ---------------------------------------------------------
    def encode(self, x: jnp.ndarray, train: bool = False):
        """x (B, H, W, C) -> (top indices (B, H/8, W/8),
        bottom indices (B, H/4, W/4))."""
        top, bottom = self._levels(x, train)
        return top[3], bottom[3]

    def decode(
        self, idx_top: jnp.ndarray, idx_bottom: jnp.ndarray,
        train: bool = False,
    ) -> jnp.ndarray:
        z_t = codebook_lookup(
            self.codebook_top, idx_top.reshape(-1)
        ).reshape(idx_top.shape + (self.dim,))
        z_b = codebook_lookup(
            self.codebook_bottom, idx_bottom.reshape(-1)
        ).reshape(idx_bottom.shape + (self.dim,))
        dec_t = self.dec_top(z_t, train).astype(jnp.float32)
        return self._decode_sts(dec_t, z_b, train)

    def __call__(self, x: jnp.ndarray, train: bool = True):
        """Returns (x_tilde, (z_e_top, z_q_top), (z_e_bottom, z_q_bottom))
        — one straight-through pair per level, each with its own
        codebook-gradient path (mirrors the flat model's contract)."""
        top, bottom = self._levels(x, train)
        st_t, z_e_t, z_q_t, _, dec_t = top
        st_b, z_e_b, z_q_b, _ = bottom
        x_tilde = self._decode_sts(dec_t, st_b, train)
        return x_tilde, (z_e_t, z_q_t), (z_e_b, z_q_b)
