"""Manifest-backed data sources with deterministic train/test split.

Rebuilds ``_NPYDataSource`` (dataloader.py:73-145): read train.txt, filter
by speaker, split train/test with sklearn ``train_test_split`` seeded by
``random_state`` (the exact reference semantics, dataloader.py:87-95),
lazy per-utterance ``.npy`` loads.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
from sklearn.model_selection import train_test_split

from neural_sound_generation_tpu.data.manifest import ManifestEntry, read_manifest


class NpyDataSource:
    """col: 0 = raw audio paths, 1 = mel paths (RawAudioDataSource /
    MelSpecDataSource, dataloader.py:148-156)."""

    def __init__(
        self,
        data_root: str,
        col: int,
        speaker_id: Optional[int] = None,
        train: bool = True,
        test_size: Optional[float] = 0.05,
        test_num_samples: Optional[int] = None,
        random_state: int = 1234,
    ):
        self.data_root = data_root
        self.col = col
        self.speaker_id = speaker_id
        self.train = train
        self.test_size = test_size
        self.test_num_samples = test_num_samples
        self.random_state = random_state

        entries = read_manifest(data_root)
        self.multi_speaker = entries[0].speaker_id is not None if entries else False

        if self.multi_speaker and speaker_id is not None:
            entries = [e for e in entries if e.speaker_id == speaker_id]
            self.multi_speaker = False

        idx = self._interest_indices(len(entries))
        entries = [entries[i] for i in idx]

        self.entries: List[ManifestEntry] = entries
        self.lengths = [e.timesteps for e in entries]
        self.speaker_ids = (
            [e.speaker_id for e in entries] if self.multi_speaker else None
        )

    def _interest_indices(self, n: int) -> np.ndarray:
        indices = np.arange(n)
        if self.test_size is None:
            test_size = self.test_num_samples / n
        else:
            test_size = self.test_size
        train_idx, test_idx = train_test_split(
            indices, test_size=test_size, random_state=self.random_state
        )
        return train_idx if self.train else test_idx

    def path(self, i: int) -> str:
        entry = self.entries[i]
        rel = entry.audio_path if self.col == 0 else entry.mel_path
        return os.path.join(self.data_root, rel)

    def __len__(self) -> int:
        return len(self.entries)

    def __getitem__(self, i: int) -> np.ndarray:
        return np.load(self.path(i))
