"""LibriVox corpus adapter (src/librivox.py).

Long-form audiobook recordings: every audio file under ``<in_dir>`` is
chunked into fixed ~8 s utterances (the reference's long-context strategy
— offline chunking instead of sequence parallelism, src/librivox.py:55-62;
SURVEY §5 "long-context").
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np

from neural_sound_generation_tpu.config import AudioConfig
from neural_sound_generation_tpu.data.corpora.engine import (
    convention,
    UtteranceSpec,
    preprocess_utterances,
)
from neural_sound_generation_tpu.data.manifest import ManifestEntry
from neural_sound_generation_tpu.ops import dsp

CHUNK_SECONDS = 8.0


def collect(in_dir: str, cfg: AudioConfig) -> List[UtteranceSpec]:
    specs: List[UtteranceSpec] = []
    paths = sorted(glob.glob(os.path.join(in_dir, "**", "*.wav"), recursive=True))
    chunk = int(CHUNK_SECONDS * cfg.sample_rate)
    for path in paths:
        # chunk lazily: each spec loads the file and slices its window
        wav_len = _wav_num_samples(path, cfg.sample_rate)
        n_chunks = max(1, wav_len // chunk)
        base = os.path.splitext(os.path.basename(path))[0]
        for ci in range(n_chunks):
            specs.append(
                UtteranceSpec(
                    utt_id=f"{base}_{ci:04d}",
                    text=f"{base} chunk {ci}",
                    loader=_make_loader(path, cfg.sample_rate, ci * chunk, chunk),
                )
            )
    return specs


def _wav_num_samples(path: str, sample_rate: int) -> int:
    # cheap length probe (reads the file; fine for preprocessing)
    return len(dsp.load_wav(path, sample_rate))


def _make_loader(path: str, sr: int, start: int, length: int):
    def load() -> np.ndarray:
        wav = dsp.load_wav(path, sr)
        return wav[start : start + length]

    return load


def build_from_path(
    in_dir: str,
    out_dir: str,
    num_workers: int = 8,
    cfg: Optional[AudioConfig] = None,
    skip_errors: bool = False,
    tqdm=lambda x, **kw: x,
    **_legacy_kwargs,
) -> List[ManifestEntry]:
    # the reference's chain for this corpus is LWS-only (audio.py:112-127)
    cfg = convention(cfg or AudioConfig())
    specs = collect(in_dir, cfg)
    return preprocess_utterances(
        specs, out_dir, cfg, name="librivox", num_workers=num_workers,
        skip_errors=skip_errors, tqdm=tqdm
    )
