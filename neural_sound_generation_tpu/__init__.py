"""neural_sound_generation_tpu — a TPU-native neural sound generation framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
``dendisuhubdy/neural_sound_generation`` (reference layout mapped in
``SURVEY.md``): speech-corpus preprocessing into mel/mu-law shards, conv
VAE / VQ-VAE autoencoders over mel frames, a GatedPixelCNN prior over the
discrete codes, Griffin-Lim mel inversion, and a motion-conditioned
generation path (C++ capture/replay library + PCA features).

Design stance (TPU-first, not a port):
  * All DSP runs as batched JAX ops on device (reference: per-utterance
    numpy/librosa on CPU worker pools, ``src/ljspeech.py:16-27``).
  * Vector quantization is a ``jax.custom_vjp`` whose hot distance+argmin
    path hits the MXU, with a fused Pallas kernel for TPU.
  * Models are flax.linen modules in NHWC (TPU-native layout); training is a
    single jitted step over a ``jax.sharding.Mesh`` — data-parallel gradient
    reduction compiles to ICI all-reduce, not NCCL.
  * Checkpointing is save **and** restore (the reference is save-only,
    ``src/main.py:61-66``).
"""

__version__ = "0.1.0"

from neural_sound_generation_tpu.config import (  # noqa: F401
    AudioConfig,
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderArchConfig,
)
