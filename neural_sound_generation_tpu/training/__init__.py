from neural_sound_generation_tpu.training.losses import (  # noqa: F401
    elbo_bce,
    elbo_mse,
    vqvae_loss,
    codebook_perplexity,
)
from neural_sound_generation_tpu.training.train_state import (  # noqa: F401
    FusedOptState,
    TrainState,
    create_train_state,
    make_lr_schedule,
)
from neural_sound_generation_tpu.training.trainer import (  # noqa: F401
    Trainer,
    make_train_step,
    make_eval_step,
)
from neural_sound_generation_tpu.training.sharding import (  # noqa: F401
    shard_train_state,
    train_state_shardings,
)
from neural_sound_generation_tpu.training import checkpoint  # noqa: F401
