"""ASR-style log-spectrogram dataset.

Rebuilds the ``SpectrogramParser`` / ``SpectrogramDataset`` capability
(src/util.py:199-292): a manifest of ``wav_path,transcript_path`` lines,
per-utterance windowed STFT magnitude -> log1p -> optional per-utterance
mean/std normalization, with the transcript mapped through a label
alphabet. The STFT here is the framework's batched on-device transform.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

import jax.numpy as jnp

from neural_sound_generation_tpu.ops import dsp


class SpectrogramParser:
    def __init__(
        self,
        sample_rate: int = 16000,
        window_size_s: float = 0.02,
        window_stride_s: float = 0.01,
        normalize: bool = True,
    ):
        self.sample_rate = sample_rate
        self.n_fft = int(sample_rate * window_size_s)
        self.hop = int(sample_rate * window_stride_s)
        self.normalize = normalize

    def parse_audio(self, path: str) -> np.ndarray:
        """wav -> (n_freq, frames) float32 log1p spectrogram."""
        wav = dsp.load_wav(path, self.sample_rate)
        D = dsp.stft(jnp.asarray(wav), self.n_fft, self.hop)
        spect = np.log1p(np.abs(np.asarray(D))).T.astype(np.float32)
        if self.normalize:
            mean, std = spect.mean(), spect.std()
            spect = (spect - mean) / max(std, 1e-5)
        return spect


class SpectrogramDataset(SpectrogramParser):
    """Manifest rows: ``/path/audio.wav,/path/transcript.txt``."""

    def __init__(self, manifest_filepath: str, labels: str, **kwargs):
        super().__init__(**kwargs)
        with open(manifest_filepath, "r", encoding="utf-8") as f:
            self.ids: List[Tuple[str, str]] = [
                tuple(line.strip().split(",")[:2]) for line in f if line.strip()
            ]
        self.labels_map: Dict[str, int] = {c: i for i, c in enumerate(labels)}

    def __len__(self) -> int:
        return len(self.ids)

    def parse_transcript(self, path: str) -> List[int]:
        with open(path, "r", encoding="utf-8") as f:
            transcript = f.read().replace("\n", "")
        return [
            self.labels_map[c] for c in transcript if c in self.labels_map
        ]

    def __getitem__(self, index: int):
        audio_path, transcript_path = self.ids[index]
        return self.parse_audio(audio_path), self.parse_transcript(transcript_path)
