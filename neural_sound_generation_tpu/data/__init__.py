from neural_sound_generation_tpu.data.manifest import (  # noqa: F401
    ManifestEntry,
    read_manifest,
    write_manifest,
    manifest_stats,
)
from neural_sound_generation_tpu.data.sources import NpyDataSource  # noqa: F401
from neural_sound_generation_tpu.data.sampler import (  # noqa: F401
    PartiallyRandomizedSimilarTimeLengthSampler,
    shard_for_host,
)
from neural_sound_generation_tpu.data.collate import collate_mel_batch  # noqa: F401
from neural_sound_generation_tpu.data.pipeline import (  # noqa: F401
    AudioDataset,
    MelFrameLoader,
    get_audio_data_loaders,
)
