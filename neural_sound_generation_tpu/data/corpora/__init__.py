from neural_sound_generation_tpu.data.corpora import (  # noqa: F401
    cmu_arctic,
    jsut,
    librivox,
    ljspeech,
)
from neural_sound_generation_tpu.data.corpora.engine import (  # noqa: F401
    UtteranceSpec,
    preprocess_utterances,
)

CORPORA = {
    "ljspeech": ljspeech,
    "cmu_arctic": cmu_arctic,
    "jsut": jsut,
    "librivox": librivox,
}
