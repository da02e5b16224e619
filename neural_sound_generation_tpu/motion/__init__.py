from neural_sound_generation_tpu.motion.capture import (  # noqa: F401
    GESTURE_STATE_START,
    GESTURE_STATE_STOP,
    GESTURE_STATE_UPDATE,
    GESTURE_TYPE_CIRCLE,
    GESTURE_TYPE_KEY_TAP,
    GESTURE_TYPE_SCREEN_TAP,
    GESTURE_TYPE_SWIPE,
    GestureEvent,
    MotionController,
    NUM_FEATURES,
    replay_controller,
    scripted_gesture_controller,
    synthetic_controller,
)
from neural_sound_generation_tpu.motion.pca import (  # noqa: F401
    PCAProjector,
    run_pca,
    run_pca_np,
)
