from neural_sound_generation_tpu.inference.audio import (  # noqa: F401
    codes_to_audio,
    hier_cond_map,
    sample_hier_audio,
    sample_hier_mels,
    extract_units,
    prior_generate,
    reconstruct_audio,
    sample_prior_audio,
    sample_prior_mels,
)
