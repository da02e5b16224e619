from neural_sound_generation_tpu.models.layers import ResBlock  # noqa: F401
from neural_sound_generation_tpu.models.vae import VAE, DefaultVAE  # noqa: F401
from neural_sound_generation_tpu.models.vqvae import VQVAE  # noqa: F401
from neural_sound_generation_tpu.models.pixelcnn import GatedPixelCNN  # noqa: F401
from neural_sound_generation_tpu.models.wavevqvae import WaveVQVAE  # noqa: F401
from neural_sound_generation_tpu.models.wavenet import WaveNet  # noqa: F401
from neural_sound_generation_tpu.models.hiervqvae import HierVQVAE  # noqa: F401
from neural_sound_generation_tpu.models.transformer_prior import (  # noqa: F401
    TransformerPrior,
)
