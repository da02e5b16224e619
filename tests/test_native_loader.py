"""Native data-loader (libnsgloader.so): bit-parity with the Python
collate, dtype handling across input types, and pipeline integration.

The native runtime mmaps every shard once and assembles batches with the
GIL released (data/native/loader.cpp) — the TPU-native answer to the
reference's DataLoader worker processes (src/dataloader.py:475)."""

import os

import numpy as np
import pytest

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.data.collate import collate_mel_batch
from neural_sound_generation_tpu.data.native_loader import (
    NativeCorpus,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain for libnsgloader"
)

HOP = 64
N_MELS = 20


def _write_corpus(tmp_path, n=6, mulaw_q=None, seed=0):
    """Synthetic shards shaped like preprocess output; varied lengths so
    both the crop and the pad branch are exercised."""
    rng = np.random.default_rng(seed)
    audio_paths, mel_paths, audio_arrays, mel_arrays = [], [], [], []
    for i in range(n):
        frames = int(rng.integers(4, 40))
        samples = frames * HOP + int(rng.integers(0, HOP))
        if mulaw_q is None:
            audio = rng.standard_normal(samples).astype(np.float32) * 0.3
        else:
            dtype = np.int16 if mulaw_q <= 32768 else np.int32
            audio = rng.integers(0, mulaw_q, samples).astype(dtype)
        mel = rng.standard_normal((frames, N_MELS)).astype(np.float32)
        ap = os.path.join(tmp_path, f"audio-{i:05d}.npy")
        mp = os.path.join(tmp_path, f"mel-{i:05d}.npy")
        np.save(ap, audio)
        np.save(mp, mel)
        audio_paths.append(ap)
        mel_paths.append(mp)
        audio_arrays.append(audio)
        mel_arrays.append(mel)
    return audio_paths, mel_paths, audio_arrays, mel_arrays


def _audio_cfg(**over):
    cfg = Config().parse_json(
        {"hop_size": HOP, "num_mels": N_MELS, **over}
    )
    return cfg.audio


def test_corpus_meta(tmp_path):
    ap, mp, audio, mel = _write_corpus(tmp_path)
    corpus = NativeCorpus(ap, mp)
    assert len(corpus) == len(ap)
    for i in range(len(ap)):
        assert corpus.audio_len[i] == len(audio[i])
        assert corpus.mel_frames[i] == mel[i].shape[0]
        assert corpus.mel_bins[i] == N_MELS
    corpus.close()


def test_native_collate_bit_parity_raw(tmp_path):
    """Same indices + same-seeded RNGs -> byte-identical batches vs the
    pure-Python collate (raw float audio)."""
    ap, mp, audio, mel = _write_corpus(tmp_path)
    cfg = _audio_cfg(input_type="raw")
    corpus = NativeCorpus(ap, mp)
    indices = [0, 3, 5, 1]
    max_steps = 16 * HOP

    items = [(audio[i], mel[i], None) for i in indices]
    ref = collate_mel_batch(
        items, cfg, max_steps, np.random.default_rng(42), one_hot=False
    )
    out = corpus.collate(
        indices, cfg, max_steps, np.random.default_rng(42)
    )
    np.testing.assert_array_equal(out["c"], ref["c"])
    np.testing.assert_array_equal(out["y"], ref["y"])
    np.testing.assert_array_equal(out["x"], ref["x"])
    np.testing.assert_array_equal(out["input_lengths"], ref["input_lengths"])
    assert out["g"] is None and ref["g"] is None
    corpus.close()


@pytest.mark.parametrize("quantize_channels", [256, 65536])
def test_native_collate_bit_parity_mulaw_quantize(tmp_path, quantize_channels):
    """mulaw-quantize corpora: int16 shards at 256 channels, int32 at
    65536 (the widened dtype from the round-2 overflow fix) — values
    survive the native path exactly."""
    ap, mp, audio, mel = _write_corpus(tmp_path, mulaw_q=quantize_channels)
    cfg = _audio_cfg(
        input_type="mulaw-quantize", quantize_channels=quantize_channels
    )
    corpus = NativeCorpus(ap, mp)
    indices = [2, 4, 0]
    max_steps = 12 * HOP

    items = [(audio[i], mel[i], None) for i in indices]
    ref = collate_mel_batch(
        items, cfg, max_steps, np.random.default_rng(7), one_hot=False
    )
    out = corpus.collate(indices, cfg, max_steps, np.random.default_rng(7))
    np.testing.assert_array_equal(out["y"], ref["y"])
    np.testing.assert_array_equal(
        np.asarray(out["x"]), np.asarray(ref["x"])
    )
    np.testing.assert_array_equal(out["c"], ref["c"])
    corpus.close()


def test_native_collate_bucket_frames(tmp_path):
    """frames_out override (bucketed batching) matches Python."""
    ap, mp, audio, mel = _write_corpus(tmp_path)
    cfg = _audio_cfg()
    corpus = NativeCorpus(ap, mp)
    indices = [1, 2]
    items = [(audio[i], mel[i], None) for i in indices]
    ref = collate_mel_batch(
        items, cfg, 64 * HOP, np.random.default_rng(3),
        frames_out=8, one_hot=False,
    )
    out = corpus.collate(
        indices, cfg, 64 * HOP, np.random.default_rng(3), frames_out=8
    )
    np.testing.assert_array_equal(out["c"], ref["c"])
    np.testing.assert_array_equal(out["y"], ref["y"])
    corpus.close()


def test_native_collate_speakers(tmp_path):
    ap, mp, audio, mel = _write_corpus(tmp_path, n=4)
    cfg = _audio_cfg()
    corpus = NativeCorpus(ap, mp)
    out = corpus.collate(
        [0, 1], cfg, 8 * HOP, np.random.default_rng(0),
        speaker_ids=[3, 5],
    )
    np.testing.assert_array_equal(out["g"], np.asarray([3, 5], np.int32))
    corpus.close()


def test_need_audio_false_skips_waveform(tmp_path):
    ap, mp, _, _ = _write_corpus(tmp_path, n=3)
    cfg = _audio_cfg()
    corpus = NativeCorpus(ap, mp)
    out = corpus.collate(
        [0, 2], cfg, 8 * HOP, np.random.default_rng(0), need_audio=False
    )
    assert "x" not in out and "y" not in out
    assert out["c"].shape[1] == N_MELS
    corpus.close()


def test_pipeline_uses_native_and_matches_python(tmp_path):
    """MelFrameLoader with use_native=True and =False produce identical
    epoch batches (same seed)."""
    from neural_sound_generation_tpu.data.manifest import (
        ManifestEntry,
        write_manifest,
    )
    from neural_sound_generation_tpu.data.pipeline import (
        AudioDataset,
        MelFrameLoader,
    )
    from neural_sound_generation_tpu.data.sources import NpyDataSource

    ap, mp, _, _ = _write_corpus(tmp_path, n=8)
    entries = [
        ManifestEntry(
            os.path.basename(a), os.path.basename(m),
            int(np.load(a).shape[0]), "t",
        )
        for a, m in zip(ap, mp)
    ]
    write_manifest(str(tmp_path), entries)

    cfg = Config().parse_json(
        {"hop_size": HOP, "num_mels": N_MELS, "max_time_steps": 8 * HOP}
    )
    # tiny corpus: keep every item in the train split
    def loaders(use_native):
        x = NpyDataSource(str(tmp_path), 0, test_size=0.125)
        mel = NpyDataSource(str(tmp_path), 1, test_size=0.125)
        ds = AudioDataset(x, mel)
        return MelFrameLoader(
            ds, cfg, batch_size=2, seed=99, use_native=use_native,
            num_workers=1,
        )

    nat = loaders(True)
    assert nat._native is not None
    py = loaders(False)
    assert py._native is None
    nb = list(iter(nat))
    pb = list(iter(py))
    assert len(nb) == len(pb) > 0
    for a, b in zip(nb, pb):
        assert set(a.keys()) == set(b.keys())
        for k in a:
            if a[k] is None:
                assert b[k] is None
            else:
                np.testing.assert_array_equal(a[k], b[k])


def test_truncated_shard_errors_not_sigbus(tmp_path):
    """A shard truncated inside the header region must surface as an
    open error (-> Python fallback), never a SIGBUS in C++."""
    ap, mp, _, _ = _write_corpus(tmp_path, n=2)
    # corrupt: truncate the second audio shard to 9 bytes (inside magic+
    # header length field)
    with open(ap[1], "r+b") as f:
        f.truncate(9)
    with pytest.raises(OSError):
        NativeCorpus(ap, mp)
    # giant header_len: valid magic, v1, header_len far beyond file size
    bogus = os.path.join(str(tmp_path), "bogus.npy")
    with open(bogus, "wb") as f:
        f.write(b"\x93NUMPY" + bytes([1, 0]) + (0xFFFF).to_bytes(2, "little"))
        f.write(b"x" * 64)
    with pytest.raises(OSError):
        NativeCorpus([bogus], [mp[0]])


def test_3d_shard_rejected_not_truncated(tmp_path):
    """A (N, T, C) shard must be REJECTED: silently parsing it as its
    first two dims would serve interleaved channel samples as a mono
    stream (the truncation check passes — the file is larger)."""
    ap, mp, _, _ = _write_corpus(tmp_path, n=2)
    three_d = os.path.join(str(tmp_path), "stereo.npy")
    np.save(three_d, np.zeros((4, 8, 2), np.float32))
    with pytest.raises(OSError):
        NativeCorpus([ap[0], three_d], [mp[0], mp[1]])


def test_record_csv_rejects_bad_frame_counts(tmp_path):
    """Negative/absurd n_frames must error cleanly through the C ABI —
    never a throwing std::vector ctor unwinding into ctypes (process
    abort)."""
    from neural_sound_generation_tpu.motion.capture import (
        scripted_gesture_controller,
    )

    ctrl = scripted_gesture_controller(fps=200.0)
    out = os.path.join(str(tmp_path), "x.csv")
    with pytest.raises(IOError):
        ctrl.record_csv(out, -1)
    with pytest.raises(IOError):
        ctrl.record_csv(out, 1 << 40)
    # the handle still works after the rejected calls
    assert ctrl.record_csv(out, 3) == 3


def test_pipeline_native_multispeaker_and_buckets(tmp_path):
    """Native loader through MelFrameLoader with speaker ids and bucketed
    frame counts matches the Python path batch-for-batch."""
    from neural_sound_generation_tpu.data.manifest import (
        ManifestEntry,
        write_manifest,
    )
    from neural_sound_generation_tpu.data.pipeline import (
        AudioDataset,
        MelFrameLoader,
    )
    from neural_sound_generation_tpu.data.sources import NpyDataSource

    ap, mp, _, _ = _write_corpus(tmp_path, n=8)
    entries = [
        ManifestEntry(
            os.path.basename(a), os.path.basename(m),
            int(np.load(a).shape[0]), "t", speaker_id=i % 3,
        )
        for i, (a, m) in enumerate(zip(ap, mp))
    ]
    write_manifest(str(tmp_path), entries)

    cfg = Config().parse_json({
        "hop_size": HOP, "num_mels": N_MELS, "max_time_steps": 16 * HOP,
    })
    import dataclasses
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, bucket_boundaries=(8, 16))
    )

    def loaders(use_native):
        x = NpyDataSource(str(tmp_path), 0, test_size=0.125)
        mel = NpyDataSource(str(tmp_path), 1, test_size=0.125)
        ds = AudioDataset(x, mel)
        return MelFrameLoader(
            ds, cfg, batch_size=2, seed=5, use_native=use_native,
            num_workers=1,
        )

    nb = list(iter(loaders(True)))
    pb = list(iter(loaders(False)))
    assert len(nb) == len(pb) > 0
    saw_g = False
    for a, b in zip(nb, pb):
        for k in a:
            if a[k] is None:
                assert b[k] is None
            else:
                np.testing.assert_array_equal(a[k], b[k])
        if a.get("g") is not None:
            saw_g = True
    assert saw_g  # speaker ids flowed through the native path
