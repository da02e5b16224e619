from neural_sound_generation_tpu.utils.augment import (  # noqa: F401
    NoiseInjection,
    augment_audio,
    change_gain,
    change_tempo,
)
from neural_sound_generation_tpu.utils.profiling import (  # noqa: F401
    StepTimer,
    trace_context,
)
from neural_sound_generation_tpu.utils.visualize import (  # noqa: F401
    project_codebook_2d,
    visualize_embedding,
)
