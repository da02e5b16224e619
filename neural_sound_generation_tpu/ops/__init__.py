from neural_sound_generation_tpu.ops import dsp, mel  # noqa: F401
from neural_sound_generation_tpu.ops.vq import (  # noqa: F401
    vq,
    vq_st,
    codebook_lookup,
)
