"""ctypes binding to the native data-loader runtime (libnsgloader.so).

The reference parallelizes loading with DataLoader worker *processes*
(src/dataloader.py:475); here the corpus shards are mmap'd once by the
C++ runtime (`data/native/loader.cpp`) and batch assembly is a GIL-free
memcpy into preallocated buffers, so the existing prefetch threads
overlap with device compute inside one process.

Crop/pad semantics and the RNG call order mirror
``data.collate.collate_mel_batch`` exactly — native batches are
bit-identical to the pure-Python path (tested in
tests/test_native_loader.py). The library is compiled on demand with
``make`` (g++) and cached next to the source; callers fall back to the
Python path when the toolchain is unavailable
(``native_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Dict, Optional, Sequence

import numpy as np

from neural_sound_generation_tpu.config import AudioConfig

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnsgloader.so")
_lib = None
_lib_lock = threading.Lock()

_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_f32p = ctypes.POINTER(ctypes.c_float)


def _build() -> None:
    subprocess.run(
        ["make", "-s"], cwd=_NATIVE_DIR, check=True, capture_output=True
    )


def load_library() -> ctypes.CDLL:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "loader.cpp")
        if not os.path.exists(_LIB_PATH) or os.path.getmtime(
            _LIB_PATH
        ) < os.path.getmtime(src):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.nsg_corpus_open.restype = ctypes.c_void_p
        lib.nsg_corpus_open.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
        ]
        lib.nsg_corpus_close.argtypes = [ctypes.c_void_p]
        lib.nsg_corpus_len.restype = ctypes.c_int
        lib.nsg_corpus_len.argtypes = [ctypes.c_void_p]
        lib.nsg_corpus_meta.argtypes = [ctypes.c_void_p, _i64p, _i64p, _i64p]
        lib.nsg_fill_mel_batch.restype = ctypes.c_int
        lib.nsg_fill_mel_batch.argtypes = [
            ctypes.c_void_p, _i32p, _i64p, _i64p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, _f32p,
        ]
        lib.nsg_fill_audio_f32.restype = ctypes.c_int
        lib.nsg_fill_audio_f32.argtypes = [
            ctypes.c_void_p, _i32p, _i64p, _i64p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_float, _f32p,
        ]
        lib.nsg_fill_audio_i32.restype = ctypes.c_int
        lib.nsg_fill_audio_i32.argtypes = [
            ctypes.c_void_p, _i32p, _i64p, _i64p, ctypes.c_int,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, _i32p,
        ]
        lib.nsg_corpus_willneed.argtypes = [ctypes.c_void_p, ctypes.c_int32]
        _lib = lib
        return lib


def native_available() -> bool:
    """True when the native loader builds/loads on this host."""
    try:
        load_library()
        return True
    except Exception:
        return False


def _mulaw_quantize_zero(mu: int) -> int:
    # the pad value is one of the parity-compared bytes — derive it from
    # the same formula the Python collate uses, never a re-implementation
    from neural_sound_generation_tpu.data.collate import _mulaw_quantize_np

    return int(_mulaw_quantize_np(np.float64(0.0), mu))


class NativeCorpus:
    """mmap'd view of a preprocessed corpus (paired audio + mel shards).

    ``audio_paths``/``mel_paths`` are absolute paths in manifest order.
    Opening with None mel entries works (the C layer skips empty paths),
    but ``collate`` requires every batch item's mel shard: it always
    fills the conditioning tensor, and a missing mel map fails there
    with a clear error rather than producing an empty batch.
    """

    def __init__(self, audio_paths: Sequence[str], mel_paths: Sequence[Optional[str]]):
        lib = load_library()
        n = len(audio_paths)
        a_arr = (ctypes.c_char_p * n)(
            *[p.encode() for p in audio_paths]
        )
        m_arr = (ctypes.c_char_p * n)(
            *[(p or "").encode() for p in mel_paths]
        )
        handle = lib.nsg_corpus_open(a_arr, m_arr, n)
        if not handle:
            raise OSError("nsg_corpus_open failed (see stderr)")
        self._lib = lib
        self._handle = handle
        self.n = n
        self.audio_len = np.zeros(n, np.int64)
        self.mel_frames = np.zeros(n, np.int64)
        self.mel_bins = np.zeros(n, np.int64)
        lib.nsg_corpus_meta(
            handle,
            self.audio_len.ctypes.data_as(_i64p),
            self.mel_frames.ctypes.data_as(_i64p),
            self.mel_bins.ctypes.data_as(_i64p),
        )

    def close(self):
        if self._handle:
            self._lib.nsg_corpus_close(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def __len__(self):
        return self.n

    def collate(
        self,
        indices: Sequence[int],
        cfg: AudioConfig,
        max_time_steps: Optional[int],
        rng: Optional[np.random.Generator] = None,
        latent_stride: int = 4,
        frames_out: Optional[int] = None,
        speaker_ids: Optional[Sequence[Optional[int]]] = None,
        need_audio: bool = True,
    ) -> Dict[str, np.ndarray]:
        """collate_mel_batch over mmap'd shards: same outputs
        (one_hot=False contract), same RNG call order, byte work in C++.
        ``need_audio=False`` skips the x/y fills for mel-mode training,
        which only consumes ``c`` (+ ``g``)."""
        from neural_sound_generation_tpu.data.collate import static_crop_frames

        rng = rng or np.random.default_rng()
        hop = cfg.effective_hop_size
        if frames_out is None:
            frames_out = static_crop_frames(max_time_steps, hop, latent_stride)
        samples_out = frames_out * hop
        b = len(indices)
        idx = np.asarray(indices, np.int32)
        a_len = self.audio_len[idx]
        m_frames = self.mel_frames[idx]
        n_mels = int(self.mel_bins[idx].max()) if b else 0
        if b and n_mels == 0:
            raise ValueError(
                "collate needs paired mel shards; this corpus was opened "
                "with empty mel paths for the requested items"
            )

        usable = np.minimum(a_len // hop, m_frames)
        starts = np.zeros(b, np.int64)
        # identical RNG call order to collate_mel_batch (one draw per
        # item that crops)
        for i in range(b):
            if usable[i] > frames_out:
                starts[i] = int(rng.integers(0, usable[i] - frames_out))
        # audio actually placed in the batch (bit-parity with
        # collate_mel_batch): usable*hop in the pad branch, samples_out
        # when cropping — not min(a_len, samples_out), which counts pad
        # samples as real audio inside the loss mask
        lengths = (np.minimum(usable, frames_out) * hop).astype(np.int32)

        lib, h = self._lib, self._handle
        c = np.empty((b, frames_out, n_mels), np.float32)
        rc = lib.nsg_fill_mel_batch(
            h, idx.ctypes.data_as(_i32p), starts.ctypes.data_as(_i64p),
            usable.ctypes.data_as(_i64p), b, frames_out, n_mels,
            c.ctypes.data_as(_f32p),
        )
        if rc != 0:
            raise RuntimeError(f"nsg_fill_mel_batch failed: {rc}")

        out: Dict[str, np.ndarray] = {
            "c": np.ascontiguousarray(c.transpose(0, 2, 1)),
            "input_lengths": lengths,
        }
        if need_audio:
            if cfg.is_mulaw_quantize:
                pad = _mulaw_quantize_zero(cfg.quantize_channels)
                y32 = np.empty((b, samples_out), np.int32)
                rc = lib.nsg_fill_audio_i32(
                    h, idx.ctypes.data_as(_i32p),
                    starts.ctypes.data_as(_i64p),
                    usable.ctypes.data_as(_i64p), b, frames_out, hop,
                    pad, y32.ctypes.data_as(_i32p),
                )
                if rc != 0:
                    raise RuntimeError(f"nsg_fill_audio_i32 failed: {rc}")
                out["y"] = y32.astype(np.int64)
                out["x"] = y32  # one_hot=False contract: int codes
            else:
                y = np.empty((b, samples_out), np.float32)
                rc = lib.nsg_fill_audio_f32(
                    h, idx.ctypes.data_as(_i32p),
                    starts.ctypes.data_as(_i64p),
                    usable.ctypes.data_as(_i64p), b, frames_out, hop,
                    0.0, y.ctypes.data_as(_f32p),
                )
                if rc != 0:
                    raise RuntimeError(f"nsg_fill_audio_f32 failed: {rc}")
                out["y"] = y
                out["x"] = y[..., None]

        if speaker_ids is not None and all(
            g is not None for g in speaker_ids
        ) and b > 0:
            out["g"] = np.asarray(speaker_ids, np.int32)
        else:
            out["g"] = None
        return out
