from neural_sound_generation_tpu.config.hparams import (  # noqa: F401
    AudioConfig,
    Config,
    DataConfig,
    ModelConfig,
    TrainConfig,
    VocoderArchConfig,
    config_debug_string,
    load_preset,
)
from neural_sound_generation_tpu.config.tacotron import (  # noqa: F401
    TacotronArchConfig,
)
