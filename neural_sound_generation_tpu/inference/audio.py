"""Batched on-device inference: unit extraction, reconstruction, and
prior-driven generation.

Rebuilds the inference capabilities implied by the reference (SURVEY §7
step 7): ``VQVAE.encode`` unit extraction (models.py:188-191),
codes->audio decoding with Griffin-Lim mel inversion (main.py:183-197),
and PixelCNN ancestral sampling feeding the decoder (models.py:327-341) —
each as a single jitted batched program.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import AudioConfig
from neural_sound_generation_tpu.models import VQVAE, GatedPixelCNN
from neural_sound_generation_tpu.models.pixelcnn import (
    fast_generate as pixelcnn_generate,
)
from neural_sound_generation_tpu.ops import dsp


@functools.lru_cache(maxsize=None)
def _encode_fn(model: VQVAE):
    # flax modules are frozen dataclasses (hashable): one jitted program
    # per model configuration instead of retracing on every call
    @jax.jit
    def run(variables, mels):
        return model.apply(variables, mels, train=False, method=VQVAE.encode)

    return run


@functools.lru_cache(maxsize=None)
def _forward_fn(model: VQVAE):
    @jax.jit
    def run(variables, mels, g):
        x_tilde, _, _ = model.apply(variables, mels, train=False, g=g)
        return x_tilde

    return run


@functools.lru_cache(maxsize=None)
def _decode_fn(model: VQVAE):
    @jax.jit
    def run(variables, indices, g):
        return model.apply(variables, indices, g, train=False, method=VQVAE.decode)

    return run


def extract_units(model: VQVAE, variables, mels: jnp.ndarray) -> jnp.ndarray:
    """Mel batch (B, num_mels, frames, 1) -> discrete unit grid
    (B, num_mels/4, frames/4) — the ZeroSpeech-style unit extraction
    (the encoder downsamples both spatial axes by 4, in input order)."""
    return _encode_fn(model)(variables, mels)


def reconstruct_audio(
    model: VQVAE,
    variables,
    mels: jnp.ndarray,
    cfg: AudioConfig,
    key: jax.Array,
    g: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mel batch -> (reconstructed mel batch, waveform batch)."""
    x_tilde = _forward_fn(model)(variables, mels, g)
    mel_batch = x_tilde[..., 0]  # (B, num_mels, frames)
    keys = jax.random.split(key, mel_batch.shape[0])
    wavs = dsp.inv_mel_spectrogram_batch(mel_batch, cfg, keys)
    return mel_batch, wavs


def codes_to_audio(
    model: VQVAE,
    variables,
    indices: jnp.ndarray,
    cfg: AudioConfig,
    key: jax.Array,
    g: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Discrete code grids (B, H', W') -> waveforms via decoder +
    Griffin-Lim."""
    mel = _decode_fn(model)(variables, indices, g)[..., 0]
    keys = jax.random.split(key, mel.shape[0])
    return dsp.inv_mel_spectrogram_batch(mel, cfg, keys)


def prior_generate(prior, prior_variables, labels, key, *, shape,
                   batch_size, cond_map=None):
    """Ancestral sampling dispatched on the prior family: PixelCNN's
    row-cached incremental sampler, or the Transformer's KV-cached one.
    Every synthesis surface (CLI sample, serving /sample, the hier chain)
    routes through this so new prior families plug in at one place."""
    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.models.transformer_prior import (
        generate as transformer_generate,
    )

    gen = (
        transformer_generate
        if isinstance(prior, TransformerPrior) else pixelcnn_generate
    )
    return gen(prior, prior_variables, labels, key, shape=shape,
               batch_size=batch_size, cond_map=cond_map)


def sample_prior_mels(
    model: VQVAE,
    variables,
    prior: GatedPixelCNN,
    prior_variables,
    labels: jnp.ndarray,
    code_shape: Tuple[int, int],
    key: jax.Array,
    g: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The prior samples code grids -> decoder. Returns (code grids,
    mel batch (B, num_mels, frames)) — the synthesis backend (Griffin-Lim
    or a trained vocoder) is the caller's choice. ``g``: (B,) speaker ids
    for multi-speaker decoders (the decoder was trained WITH the speaker
    embedding; omitting it decodes degraded/wrong-speaker audio)."""
    codes = prior_generate(
        prior, prior_variables, labels, key,
        shape=code_shape, batch_size=int(labels.shape[0]),
    )
    mels = _decode_fn(model)(variables, codes, g)[..., 0]
    return codes, mels


def sample_prior_audio(
    model: VQVAE,
    variables,
    prior: GatedPixelCNN,
    prior_variables,
    labels: jnp.ndarray,
    code_shape: Tuple[int, int],
    cfg: AudioConfig,
    key: jax.Array,
    g: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full generative path: PixelCNN samples code grids -> decoder ->
    Griffin-Lim. Returns (code grids, waveforms)."""
    k1, k2 = jax.random.split(key)
    codes, mels = sample_prior_mels(
        model, variables, prior, prior_variables, labels, code_shape, k1,
        g=g,
    )
    keys = jax.random.split(k2, mels.shape[0])
    return codes, dsp.inv_mel_spectrogram_batch(mels, cfg, keys)


# --------------------------------------------------------------------------
# Hierarchical (two-level) generative chain
# --------------------------------------------------------------------------


def hier_cond_map(vqvae_variables, idx_top: jnp.ndarray):
    """Conditioning map for the bottom prior: the top codes' codebook
    vectors, nearest-upsampled x2 to the bottom grid (B, Hb, Wb, dim)."""
    from neural_sound_generation_tpu.ops.vq import codebook_lookup

    cb_top = vqvae_variables["params"]["codebook_top"]
    z = codebook_lookup(cb_top, idx_top.reshape(-1)).reshape(
        idx_top.shape + (cb_top.shape[-1],)
    )
    return jnp.repeat(jnp.repeat(z, 2, axis=1), 2, axis=2)


@functools.lru_cache(maxsize=None)
def _hier_cond_fn():
    return jax.jit(hier_cond_map)


@functools.lru_cache(maxsize=None)
def _hier_decode_fn(model):
    # jitted like _decode_fn: the eager flax apply runs the conv decoder
    # op-by-op, and on the axon TPU eager ops pay a per-op dispatch round
    # trip (and some are outright unsupported outside jit)
    from neural_sound_generation_tpu.models import HierVQVAE

    @jax.jit
    def run(variables, idx_t, idx_b):
        return model.apply(
            variables, idx_t, idx_b, train=False, method=HierVQVAE.decode
        )

    return run


def sample_hier_mels(
    vqvae_model,
    vqvae_variables,
    top_prior: GatedPixelCNN,
    top_variables,
    bottom_prior: GatedPixelCNN,
    bottom_variables,
    labels: jnp.ndarray,
    top_shape: Tuple[int, int],
    key: jax.Array,
):
    """VQ-VAE-2-style ancestral chain up to the decoded mel: sample the
    top prior, condition the bottom prior on the decoded top codes, and
    decode both levels. Returns (idx_top, idx_bottom, mel batch); the
    synthesis backend is the caller's choice. ``bottom_prior`` must be
    built with ``spatial_cond=True``."""
    B = int(labels.shape[0])
    Ht, Wt = top_shape
    # 3-way split with the third (Griffin-Lim) key unused, so samples are
    # bit-identical to sample_hier_audio's under the same key
    k_t, k_b, _ = jax.random.split(key, 3)
    idx_t = prior_generate(
        top_prior, top_variables, labels, k_t, shape=(Ht, Wt), batch_size=B
    )
    cond = _hier_cond_fn()(vqvae_variables, idx_t)
    idx_b = prior_generate(
        bottom_prior, bottom_variables, labels, k_b,
        shape=(2 * Ht, 2 * Wt), batch_size=B, cond_map=cond,
    )
    mels = _hier_decode_fn(vqvae_model)(vqvae_variables, idx_t, idx_b)[..., 0]
    return idx_t, idx_b, mels


def sample_hier_audio(
    vqvae_model,
    vqvae_variables,
    top_prior: GatedPixelCNN,
    top_variables,
    bottom_prior: GatedPixelCNN,
    bottom_variables,
    labels: jnp.ndarray,
    top_shape: Tuple[int, int],
    cfg: AudioConfig,
    key: jax.Array,
):
    """VQ-VAE-2-style ancestral chain: sample the top prior, condition
    the bottom prior on the decoded top codes, decode both levels, and
    invert the mel with Griffin-Lim.

    Returns (idx_top, idx_bottom, waveforms). ``bottom_prior`` must be
    built with ``spatial_cond=True``.
    """
    _, _, k_w = jax.random.split(key, 3)
    idx_t, idx_b, mels = sample_hier_mels(
        vqvae_model, vqvae_variables, top_prior, top_variables,
        bottom_prior, bottom_variables, labels, top_shape, key,
    )
    keys = jax.random.split(k_w, int(labels.shape[0]))
    wavs = dsp.inv_mel_spectrogram_batch(mels, cfg, keys)
    return idx_t, idx_b, wavs
