"""Motion-conditioned sound generation.

Completes what the reference stubbed: its realtime listener extracts
joint angles and projects through PCA, but the decoder call is commented
out (``load_model`` is ``pass``, ``result = model(latent)`` commented —
src/inference.py:30-31, 154-156). Here the loop is closed: a native
MotionController streams joint-angle frames, PCAProjector reduces them,
and a feature-conditioned VQ-VAE decoder (models/vqvae.py
``decode_from_features``) renders mel frames, optionally inverted to
audio on device (BASELINE config #5).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import AudioConfig
from neural_sound_generation_tpu.models import VQVAE
from neural_sound_generation_tpu.motion.capture import MotionController
from neural_sound_generation_tpu.motion.pca import PCAProjector
from neural_sound_generation_tpu.ops import dsp


class MotionDrivenGenerator:
    """latents (B, n_components) -> mel frames -> audio, batched on device."""

    def __init__(
        self,
        model: VQVAE,
        variables,
        projector: PCAProjector,
        cfg: AudioConfig,
        latent_hw: Tuple[int, int] = (20, 8),
    ):
        assert model.cond_features == projector.n_components, (
            f"model expects {model.cond_features} conditioning features, "
            f"projector provides {projector.n_components}"
        )
        self.model = model
        self.variables = variables
        self.projector = projector
        self.cfg = cfg
        self.latent_hw = latent_hw

        @jax.jit
        def _decode(variables, latents):
            return model.apply(
                variables,
                latents.astype(jnp.float32),
                latent_hw,
                train=False,
                method=VQVAE.decode_from_features,
            )

        self._decode = _decode

    def frames_to_mel(self, feature_frames: np.ndarray) -> jnp.ndarray:
        """Joint-angle frames (B, 18) -> mel batch (B, num_mels, frames)."""
        latents = self.projector.project(feature_frames)
        mel = self._decode(self.variables, jnp.asarray(latents))
        return mel[..., 0]

    def frames_to_audio(
        self, feature_frames: np.ndarray, key: jax.Array
    ) -> jnp.ndarray:
        mel = self.frames_to_mel(feature_frames)
        keys = jax.random.split(key, mel.shape[0])
        return dsp.inv_mel_spectrogram_batch(mel, self.cfg, keys)

    def run_stream(
        self,
        controller: MotionController,
        window: int = 16,
        max_windows: Optional[int] = None,
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Consume a controller synchronously in windows of ``window``
        frames, yielding (latents, mel) per window (the streaming decode
        loop of src/inference.py:68-156, pull-based). Each window's
        projected latents are mean-pooled into one conditioning vector
        producing one mel window — consecutive windows form a continuous
        mel stream."""
        produced = 0
        while max_windows is None or produced < max_windows:
            frames = controller.drain(window)
            if len(frames) == 0:
                break
            latents = self.projector.project(frames)
            pooled = latents.mean(axis=0, keepdims=True)  # (1, n_components)
            mel = np.asarray(self._decode(self.variables, jnp.asarray(pooled)))
            yield latents, mel[0, ..., 0]  # (num_mels, frames)
            produced += 1
