"""Raw-waveform VQ-VAE: strided 1-D conv encoder/decoder over samples.

BASELINE config #3 ("Mu-law raw-waveform VQ-VAE (strided 1D conv
encoder/decoder)"): the ZeroSpeech-style unit-discovery variant that
quantizes the waveform directly instead of mel frames. The reference
carries the configuration surface for this (input_type raw / mulaw /
mulaw-quantize, quantize_channels — src/hparams.py:23-24) but only ships
the 2-D mel model; this module completes the family.

Input modes:
  * raw / mulaw ("scalar input", src/hparams.py:19-20): (B, T, 1) floats,
    tanh output, MSE reconstruction.
  * mulaw-quantize: (B, T) int codes embedded to channels; output is
    (B, T, quantize_channels) logits with cross-entropy reconstruction
    (the softmax-output convention, src/hparams.py:18-21).

Downsampling is 2^num_layers (default 6 -> 64x): each encoder layer is a
stride-2 width-4 conv, so the discrete unit rate at 16 kHz is 250 Hz.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from neural_sound_generation_tpu.models.layers import (
    ConvTranspose, _s2d_conv, conv_kernel_init)
from neural_sound_generation_tpu.ops.vq import (
    codebook_lookup, residual_vq, vq, vq_st)


class ResBlock1D(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        h = nn.relu(x)
        h = nn.Conv(self.dim, (3,), padding=((1, 1),), kernel_init=conv_kernel_init)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (1,), kernel_init=conv_kernel_init)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        return x + h


class WaveEncoder(nn.Module):
    dim: int
    num_downsample: int

    @nn.compact
    def __call__(self, h, train: bool = True):
        for i in range(self.num_downsample):
            h = nn.Conv(
                self.dim, (4,), strides=(2,), padding=((1, 1),),
                kernel_init=conv_kernel_init, name=f"conv_{i}",
                conv_general_dilated=_s2d_conv,
            )(h)
            if i < self.num_downsample - 1:
                h = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(h)
                h = nn.relu(h)
        h = ResBlock1D(self.dim, name="res_0")(h, train)
        return ResBlock1D(self.dim, name="res_1")(h, train)


class WaveDecoder(nn.Module):
    dim: int
    num_downsample: int
    out_channels: int
    categorical: bool

    @nn.compact
    def __call__(self, d, train: bool = True):
        d = ResBlock1D(self.dim, name="res_0")(d, train)
        d = ResBlock1D(self.dim, name="res_1")(d, train)
        d = nn.relu(d)
        for i in range(self.num_downsample - 1):
            d = ConvTranspose(
                self.dim, (4,), strides=(2,), padding="SAME",
                kernel_init=conv_kernel_init, name=f"conv_{i}",
            )(d)
            d = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(d)
            d = nn.relu(d)
        out = ConvTranspose(
            self.out_channels, (4,), strides=(2,), padding="SAME",
            kernel_init=conv_kernel_init, name="out",
        )(d)
        return out if self.categorical else nn.tanh(out)


class WaveVQVAE(nn.Module):
    dim: int = 256
    z_dim: int = 512
    num_downsample: int = 6
    input_type: str = "raw"  # raw | mulaw | mulaw-quantize
    quantize_channels: int = 256
    n_speakers: int = 0
    gin_channels: int = -1
    # residual VQ stages (SoundStream-style) on the waveform units;
    # 1 = single codebook. Codebook becomes (num_quantizers, z_dim, dim).
    num_quantizers: int = 1

    @property
    def hop(self) -> int:
        return 2**self.num_downsample

    @property
    def categorical(self) -> bool:
        return self.input_type == "mulaw-quantize"

    def setup(self):
        init = nn.initializers.uniform(scale=2.0 / self.z_dim)
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
        self.encoder = WaveEncoder(self.dim, self.num_downsample)
        self.decoder = WaveDecoder(
            self.dim,
            self.num_downsample,
            self.quantize_channels if self.categorical else 1,
            self.categorical,
        )
        if self.categorical:
            self.input_embed = nn.Embed(self.quantize_channels, self.dim)
        if self.n_speakers > 0 and self.gin_channels > 0:
            self.speaker_embed = nn.Embed(self.n_speakers, self.gin_channels)
            self.speaker_proj = nn.Dense(self.dim, kernel_init=conv_kernel_init)

    def _embed_input(self, x):
        if self.categorical:
            return self.input_embed(x)  # (B, T) int -> (B, T, dim)
        return x  # (B, T, 1) float

    def _condition(self, d, g):
        # ignore speaker ids when the model is unconditioned (the
        # WaveNet convention, models/wavenet.py:174): corpora that carry
        # them (cmu_arctic layouts) must still train gin<=0 configs,
        # e.g. the 8-bit preset (gin_channels=-1) on CMU Arctic
        if g is not None and self.n_speakers > 0 and self.gin_channels > 0:
            emb = self.speaker_proj(self.speaker_embed(g))
            d = d + emb[:, None, :]
        return d

    def __call__(self, x, train: bool = True, g: Optional[jnp.ndarray] = None):
        z_e = self.encoder(self._embed_input(x), train)
        if self.num_quantizers > 1:
            codes_st, z_q, _ = residual_vq(z_e, self.codebook)
        else:
            codes_st, indices = vq_st(z_e, self.codebook)
            z_q = codebook_lookup(self.codebook, indices).reshape(z_e.shape)
        out = self.decoder(self._condition(codes_st, g), train)
        return out, z_e, z_q

    def encode(self, x, train: bool = False):
        """Waveform -> discrete unit indices (B, T / 2^num_downsample) —
        ZeroSpeech unit extraction; (Q, B, T') stage indices under
        residual VQ."""
        z_e = self.encoder(self._embed_input(x), train)
        if self.num_quantizers > 1:
            _, _, indices = residual_vq(z_e, self.codebook)
            return indices.reshape(
                (self.num_quantizers,) + z_e.shape[:-1]
            )
        return vq(z_e, self.codebook)

    def quantized_latents(self, x, train: bool = False):
        """Waveform -> the quantized latent sequence z_q (B, T', dim) —
        the continuous form of the discrete units, summed over stages
        under RVQ. This is the conditioning signal for the units ->
        WaveNet decode chain (`cli.vocoder train --condition units`):
        the autoregressive decoder the raw-waveform VQ-VAE needs for
        sample-level fidelity (the strided-conv decoder's conditional-
        mean ceiling, PERF.md round-5 wave soak)."""
        z_e = self.encoder(self._embed_input(x), train)
        if self.num_quantizers > 1:
            _, z_q, _ = residual_vq(z_e, self.codebook)
            return z_q
        indices = vq(z_e, self.codebook)
        return codebook_lookup(self.codebook, indices).reshape(z_e.shape)

    def decode(self, indices, g: Optional[jnp.ndarray] = None, train: bool = False):
        """Unit indices -> waveform (or logits for mulaw-quantize);
        (Q, B, T') stage indices sum their stage vectors under RVQ."""
        if self.num_quantizers > 1:
            z_q = 0.0
            for q in range(self.num_quantizers):
                z_q = z_q + codebook_lookup(self.codebook[q], indices[q])
        else:
            z_q = codebook_lookup(self.codebook, indices)
        return self.decoder(self._condition(z_q, g), train)
