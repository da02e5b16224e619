from neural_sound_generation_tpu.ops.pallas.vq_kernel import (  # noqa: F401
    nearest_codebook_indices,
    pallas_supported,
)
