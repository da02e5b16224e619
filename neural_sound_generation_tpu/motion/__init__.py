from neural_sound_generation_tpu.motion.capture import (  # noqa: F401
    MotionController,
    NUM_FEATURES,
    replay_controller,
    synthetic_controller,
)
from neural_sound_generation_tpu.motion.pca import (  # noqa: F401
    PCAProjector,
    run_pca,
    run_pca_np,
)
