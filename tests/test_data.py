"""Data pipeline tests: manifest, split determinism, sampler semantics,
static-shape collate, corpus preprocessing engine, and loaders."""

import os

import numpy as np
import pytest

from neural_sound_generation_tpu.config import AudioConfig, Config
from neural_sound_generation_tpu.data import (
    AudioDataset,
    ManifestEntry,
    MelFrameLoader,
    NpyDataSource,
    PartiallyRandomizedSimilarTimeLengthSampler,
    collate_mel_batch,
    get_audio_data_loaders,
    manifest_stats,
    read_manifest,
    shard_for_host,
    write_manifest,
)
from neural_sound_generation_tpu.data.collate import (
    as_model_batch,
    ensure_divisible,
    static_crop_frames,
)
from neural_sound_generation_tpu.data.corpora import ljspeech
from neural_sound_generation_tpu.data.corpora.engine import (
    UtteranceSpec,
    preprocess_utterances,
)
from neural_sound_generation_tpu.ops import dsp


# ----------------------------------------------------------------- manifest


def test_manifest_roundtrip(tmp_path):
    entries = [
        ManifestEntry("a-00001.npy", "m-00001.npy", 7936, "hello world"),
        ManifestEntry("a-00002.npy", "m-00002.npy", 12800, "bye|pipe"),
    ]
    # NOTE: text containing '|' would corrupt the format; reference has the
    # same property. Use clean text.
    entries[1] = ManifestEntry("a-00002.npy", "m-00002.npy", 12800, "bye")
    write_manifest(str(tmp_path), entries)
    back = read_manifest(str(tmp_path))
    assert back == entries
    stats = manifest_stats(back, 22050, 256)
    assert stats["utterances"] == 2
    assert stats["total_timesteps"] == 7936 + 12800


def test_manifest_multispeaker(tmp_path):
    entries = [
        ManifestEntry("a.npy", "m.npy", 100, "x", speaker_id=3),
    ]
    write_manifest(str(tmp_path), entries)
    back = read_manifest(str(tmp_path))
    assert back[0].speaker_id == 3


# ------------------------------------------------------------------ sources


def _write_corpus(tmp_path, n=20, multispeaker=False):
    rng = np.random.default_rng(0)
    entries = []
    for i in range(n):
        ts = 256 * (10 + i)
        a = rng.standard_normal(ts).astype(np.float32)
        m = rng.standard_normal((ts // 256, 80)).astype(np.float32)
        np.save(tmp_path / f"c-audio-{i:05d}.npy", a)
        np.save(tmp_path / f"c-mel-{i:05d}.npy", m)
        entries.append(
            ManifestEntry(
                f"c-audio-{i:05d}.npy",
                f"c-mel-{i:05d}.npy",
                ts,
                f"utt {i}",
                speaker_id=(i % 3) if multispeaker else None,
            )
        )
    write_manifest(str(tmp_path), entries)
    return entries


def test_split_deterministic_and_disjoint(tmp_path):
    _write_corpus(tmp_path)
    tr1 = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
    tr2 = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
    te = NpyDataSource(str(tmp_path), 0, train=False, test_size=0.25)
    assert [e.text for e in tr1.entries] == [e.text for e in tr2.entries]
    train_set = {e.text for e in tr1.entries}
    test_set = {e.text for e in te.entries}
    assert not train_set & test_set
    assert len(train_set) + len(test_set) == 20
    assert len(test_set) == 5


def test_test_num_samples(tmp_path):
    _write_corpus(tmp_path)
    te = NpyDataSource(
        str(tmp_path), 0, train=False, test_size=None, test_num_samples=4
    )
    assert len(te) == 4


def test_speaker_filter(tmp_path):
    _write_corpus(tmp_path, multispeaker=True)
    src = NpyDataSource(str(tmp_path), 0, speaker_id=1, train=True, test_size=0.3)
    assert not src.multi_speaker  # becomes single-speaker view
    full = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.3)
    assert full.multi_speaker
    assert all(s is not None for s in full.speaker_ids)


def test_source_loads_npy(tmp_path):
    _write_corpus(tmp_path)
    src = NpyDataSource(str(tmp_path), 1, train=True, test_size=0.25)
    mel = src[0]
    assert mel.ndim == 2 and mel.shape[1] == 80


# ------------------------------------------------------------------ sampler


def test_sampler_covers_all_indices():
    lengths = list(range(100, 0, -1))
    s = PartiallyRandomizedSimilarTimeLengthSampler(lengths, batch_size=8)
    idx = list(iter(s))
    assert sorted(idx) == list(range(100))


def test_sampler_batches_have_similar_lengths():
    rng = np.random.default_rng(0)
    lengths = rng.integers(100, 10000, 256).tolist()
    s = PartiallyRandomizedSimilarTimeLengthSampler(
        lengths, batch_size=8, batch_group_size=32
    )
    idx = list(iter(s))
    # within a batch, lengths stay within the group's span: compare batch
    # length spread to global spread
    spreads = []
    for b in range(0, 256, 8):
        ls = [lengths[i] for i in idx[b : b + 8]]
        spreads.append(max(ls) - min(ls))
    assert np.median(spreads) < (max(lengths) - min(lengths)) / 4


def test_sampler_epochs_differ():
    s = PartiallyRandomizedSimilarTimeLengthSampler(list(range(64)), batch_size=8)
    a = list(iter(s))
    b = list(iter(s))
    assert a != b  # rng advances between epochs


def test_shard_for_host_partition():
    idx = list(range(32))
    shards = [shard_for_host(idx, 4, h, batch_size=4) for h in range(4)]
    # disjoint, whole batches, covering everything
    all_items = sorted(i for s in shards for i in s)
    assert all_items == idx
    for s in shards:
        assert len(s) % 4 == 0


# ------------------------------------------------------------------ collate


def test_ensure_divisible():
    assert ensure_divisible(8000, 256) == 7936
    assert ensure_divisible(7936, 256) == 7936
    assert ensure_divisible(8000, 256, lower=False) == 8192


def test_static_crop_frames():
    # 8000 steps @ hop 256 -> 31 frames -> 28 (multiple of stride 4)
    assert static_crop_frames(8000, 256) == 28
    assert static_crop_frames(8192, 256) == 32


def test_collate_static_shapes(rng):
    cfg = AudioConfig()
    items = []
    for n_frames in (10, 40, 100):
        audio = rng.standard_normal(n_frames * 256).astype(np.float32)
        mel = rng.standard_normal((n_frames, 80)).astype(np.float32)
        items.append((audio, mel, None))
    out = collate_mel_batch(items, cfg, max_time_steps=8000, rng=rng)
    assert out["c"].shape == (3, 80, 28)
    assert out["x"].shape == (3, 28 * 256, 1)
    assert out["y"].shape == (3, 28 * 256)
    assert out["g"] is None
    model_batch = as_model_batch(out)
    assert model_batch["x"].shape == (3, 80, 28, 1)


def test_collate_crop_alignment(rng):
    """Cropped audio must correspond to the cropped mel frames (hop-aligned,
    dataloader.py:355-367 semantics)."""
    cfg = AudioConfig()
    n_frames = 100
    audio = np.arange(n_frames * 256, dtype=np.float32)
    mel = np.arange(n_frames, dtype=np.float32)[:, None].repeat(80, 1)
    out = collate_mel_batch([(audio, mel, None)], cfg, max_time_steps=8000, rng=rng)
    first_frame = int(out["c"][0, 0, 0])
    first_sample = float(out["y"][0, 0])
    assert first_sample == first_frame * 256


def test_collate_mulaw_quantize_one_hot(rng):
    cfg = AudioConfig(input_type="mulaw-quantize", quantize_channels=256)
    n_frames = 10
    q = rng.integers(0, 256, n_frames * 256).astype(np.int64)
    mel = rng.standard_normal((n_frames, 80)).astype(np.float32)
    out = collate_mel_batch([(q, mel, None)], cfg, max_time_steps=8000, rng=rng)
    assert out["x"].shape == (1, 28 * 256, 256)  # one-hot
    assert out["y"].dtype == np.int64
    # padding value is mulaw_quantize(0, 256) == 128
    assert int(out["y"][0, -1]) == 128


def test_collate_speakers(rng):
    cfg = AudioConfig()
    items = [
        (rng.standard_normal(2560).astype(np.float32),
         rng.standard_normal((10, 80)).astype(np.float32), s)
        for s in (0, 5)
    ]
    out = collate_mel_batch(items, cfg, max_time_steps=8000, rng=rng)
    np.testing.assert_array_equal(out["g"], [0, 5])


# ----------------------------------------------------- preprocessing engine


def _make_wav_corpus(tmp_path, n=6, sr=22050):
    """Synthetic LJSpeech-layout corpus."""
    rng = np.random.default_rng(0)
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir(parents=True)
    lines = []
    for i in range(n):
        dur = 0.3 + 0.15 * i
        t = np.arange(int(sr * dur)) / sr
        wav = (0.5 * np.sin(2 * np.pi * (200 + 50 * i) * t)).astype(np.float32)
        dsp.save_wav(wav, str(wav_dir / f"LJ-{i:04d}.wav"), sr)
        lines.append(f"LJ-{i:04d}|raw text {i}|normalized text {i}")
    (tmp_path / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return tmp_path


def test_ljspeech_preprocess_end_to_end(tmp_path):
    in_dir = _make_wav_corpus(tmp_path / "in")
    out_dir = tmp_path / "out"
    cfg = AudioConfig()
    entries = ljspeech.build_from_path(str(in_dir), str(out_dir), num_workers=2, cfg=cfg)
    assert len(entries) == 6
    # artifact contract (src/ljspeech.py:92-102)
    for k, e in enumerate(entries):
        assert e.audio_path == f"ljspeech-audio-{k + 1:05d}.npy"
        assert e.text == f"normalized text {k}"
        audio = np.load(out_dir / e.audio_path)
        mel = np.load(out_dir / e.mel_path)
        assert mel.dtype == np.float32 and mel.shape[1] == 80
        # alignment: len(audio) == n_frames * hop and == manifest timesteps
        assert len(audio) == mel.shape[0] * 256 == e.timesteps
        # normalized mel in [0, max_abs]
        assert mel.min() >= 0 and mel.max() <= cfg.max_abs_value + 1e-6


def test_preprocess_mulaw_quantize(tmp_path):
    in_dir = _make_wav_corpus(tmp_path / "in", n=3)
    out_dir = tmp_path / "out"
    cfg = AudioConfig(input_type="mulaw-quantize", quantize_channels=256)
    entries = ljspeech.build_from_path(str(in_dir), str(out_dir), cfg=cfg)
    audio = np.load(out_dir / entries[0].audio_path)
    assert audio.dtype == np.int16
    assert audio.min() >= 0 and audio.max() <= 256


def test_preprocess_mulaw_quantize_65536_no_overflow(tmp_path):
    """Regression: the default quantize_channels is 65536; int16 would wrap
    every sample >= 32768 negative. The engine must pick int32 and the
    saved ids must round-trip losslessly through inv_mulaw_quantize."""
    import jax.numpy as jnp

    in_dir = _make_wav_corpus(tmp_path / "in", n=2)
    out_dir = tmp_path / "out"
    cfg = AudioConfig(input_type="mulaw-quantize", quantize_channels=65536)
    entries = ljspeech.build_from_path(str(in_dir), str(out_dir), cfg=cfg)
    audio = np.load(out_dir / entries[0].audio_path)
    assert audio.dtype == np.int32
    assert audio.min() >= 0 and audio.max() < 65536
    # a loud sine quantizes well above the int16 ceiling somewhere
    assert audio.max() > 32768
    # round-trip: re-quantizing the dequantized signal returns the ids up
    # to 1 step of float32 jitter (65536 levels sit at f32 resolution) —
    # the int16 wrap this guards against was a >32768 sign flip
    rec = np.asarray(dsp.inv_mulaw_quantize(jnp.asarray(audio), 65536))
    requant = np.asarray(dsp.mulaw_quantize(jnp.asarray(rec), 65536))
    assert np.abs(requant.astype(np.int64) - audio.astype(np.int64)).max() <= 1


def test_preprocess_mulaw_quantize_65536_trims_silence(tmp_path):
    """Regression (round-2 verdict): the trim midpoint must be derived as
    (quantize_channels - 1) // 2, not hard-coded 127. At 65536 channels
    silence quantizes to ~32768, so |q - 127| > thr was true everywhere
    and the trim silently became a no-op — padded-silence utterances kept
    their full length."""
    sr = 22050
    wav_dir = tmp_path / "in" / "wavs"
    wav_dir.mkdir(parents=True)
    t = np.arange(int(sr * 0.3)) / sr
    voiced = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    silence = np.zeros(int(sr * 0.25), np.float32)
    wav = np.concatenate([silence, voiced, silence])
    dsp.save_wav(wav, str(wav_dir / "LJ-0000.wav"), sr)
    (tmp_path / "in" / "metadata.csv").write_text(
        "LJ-0000|raw|normalized", encoding="utf-8"
    )
    out_dir = tmp_path / "out"
    cfg = AudioConfig(input_type="mulaw-quantize", quantize_channels=65536)
    entries = ljspeech.build_from_path(str(tmp_path / "in"), str(out_dir), cfg=cfg)
    audio = np.load(out_dir / entries[0].audio_path)
    # trimmed output covers the ~0.3 s voiced span (+ frame-alignment
    # pads), NOT the 0.8 s padded signal a no-op trim would keep
    assert len(audio) < int(0.5 * sr), (
        f"trim was a no-op: kept {len(audio)} of {len(wav)} samples"
    )
    assert len(audio) >= len(voiced)


def test_preprocess_mel_matches_single_utterance(tmp_path):
    """Batched bucket processing must produce the same mel as the direct
    single-utterance transform."""
    in_dir = _make_wav_corpus(tmp_path / "in", n=3)
    out_dir = tmp_path / "out"
    cfg = AudioConfig()
    entries = ljspeech.build_from_path(str(in_dir), str(out_dir), cfg=cfg)
    import jax.numpy as jnp

    wav = dsp.load_wav(str(in_dir / "wavs" / "LJ-0001.wav"), 22050)
    wav = wav / np.abs(wav).max() * cfg.rescaling_max
    direct = np.asarray(dsp.melspectrogram(jnp.asarray(wav), cfg)).T
    stored = np.load(out_dir / entries[1].mel_path)
    assert stored.shape == direct.shape
    np.testing.assert_allclose(stored, direct, atol=2e-3)


# ------------------------------------------------------------------ loaders


def test_get_audio_data_loaders_end_to_end(tmp_path):
    in_dir = _make_wav_corpus(tmp_path / "in", n=8)
    out_dir = tmp_path / "out"
    cfg = Config()
    entries = ljspeech.build_from_path(str(in_dir), str(out_dir), cfg=cfg.audio)
    write_manifest(str(out_dir), entries)
    loaders = get_audio_data_loaders(str(out_dir), None, batch_size=2, cfg=cfg)
    batch = next(iter(loaders["train"]))
    assert batch["x"].shape == (2, 80, 28, 1)
    assert np.isfinite(batch["x"]).all()
    n = sum(1 for _ in loaders["train"])
    assert n == len(loaders["train"]) > 0


def test_loader_host_sharding(tmp_path):
    _write_corpus(tmp_path, n=32)
    cfg = Config()
    x = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
    mel = NpyDataSource(str(tmp_path), 1, train=True, test_size=0.25)
    ds = AudioDataset(x, mel)
    seen = []
    for host in range(2):
        loader = MelFrameLoader(
            ds, cfg, batch_size=2, num_hosts=2, host_id=host, shuffle=False
        )
        seen.append(sum(1 for _ in loader))
    assert seen[0] == seen[1] == len(ds) // 2 // 2


def test_jsut_adapter_with_lab_trimming(tmp_path):
    """JSUT layout: subset dirs with wav/ + transcript + HTS .lab
    alignments driving the silence trim (src/jsut.py:41-49 semantics)."""
    from neural_sound_generation_tpu.data.corpora import jsut

    sr = 24000
    subset = tmp_path / "in" / "basic5000"
    (subset / "wav").mkdir(parents=True)
    (subset / "lab").mkdir(parents=True)
    t = np.arange(int(sr * 1.0)) / sr
    wav = (0.5 * np.sin(2 * np.pi * 300 * t)).astype(np.float32)
    # silence at both ends
    wav[: sr // 4] = 0
    wav[-sr // 4 :] = 0
    dsp.save_wav(wav, str(subset / "wav" / "BASIC5000_0001.wav"), sr)
    # HTS lab: 100ns units; voiced region = [0.25s, 0.75s]
    (subset / "lab" / "BASIC5000_0001.lab").write_text(
        "0 2500000 silB\n2500000 7500000 a\n7500000 10000000 silE\n"
    )
    (subset / "transcript_utf8.txt").write_text(
        "BASIC5000_0001:text here\n", encoding="utf-8"
    )

    cfg = AudioConfig(sample_rate=sr, fmax=11000)
    entries = jsut.build_from_path(str(tmp_path / "in"), str(tmp_path / "out"), cfg=cfg)
    assert len(entries) == 1
    assert entries[0].text == "text here"
    # trimmed to ~0.5 s (the lab's voiced span), hop-aligned
    assert abs(entries[0].timesteps - sr // 2) < 1024


def test_librivox_adapter_chunks_long_audio(tmp_path):
    """LibriVox: long recordings chunk into ~8 s utterances
    (src/librivox.py:55-62 semantics)."""
    from neural_sound_generation_tpu.data.corpora import librivox

    sr = 22050
    (tmp_path / "in").mkdir()
    t = np.arange(int(sr * 20)) / sr  # 20 s -> 2 full 8 s chunks
    wav = (0.4 * np.sin(2 * np.pi * 180 * t)).astype(np.float32)
    dsp.save_wav(wav, str(tmp_path / "in" / "book_ch01.wav"), sr)

    cfg = AudioConfig()
    entries = librivox.build_from_path(
        str(tmp_path / "in"), str(tmp_path / "out"), cfg=cfg
    )
    assert len(entries) == 2
    for e in entries:
        assert abs(e.timesteps - 8 * sr) < 1024
        mel = np.load(tmp_path / "out" / e.mel_path)
        assert mel.shape[0] * 256 == e.timesteps


def test_preprocess_skip_errors(tmp_path):
    """skip_errors drops undecodable utterances instead of aborting."""
    from neural_sound_generation_tpu.data.corpora.engine import (
        UtteranceSpec,
        preprocess_utterances,
    )

    sr = 22050
    good = tmp_path / "good.wav"
    t = np.arange(sr // 2) / sr
    dsp.save_wav((0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), str(good), sr)
    bad = tmp_path / "bad.wav"
    bad.write_bytes(b"not a wav file at all")

    specs = [
        UtteranceSpec("good", "ok", wav_path=str(good)),
        UtteranceSpec("bad", "broken", wav_path=str(bad)),
    ]
    cfg = AudioConfig()
    # without skip_errors: raises
    with pytest.raises(Exception):
        preprocess_utterances(specs, str(tmp_path / "o1"), cfg)
    # with skip_errors: the good one survives
    entries = preprocess_utterances(
        specs, str(tmp_path / "o2"), cfg, skip_errors=True
    )
    assert len(entries) == 1 and entries[0].text == "ok"


def test_bucket_boundaries_reduce_padding(tmp_path):
    """DataConfig.bucket_boundaries: short batches pad to their bucket's
    frame count instead of the global crop size."""
    import dataclasses

    _write_corpus(tmp_path, n=16)  # lengths 10..25 frames
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, bucket_boundaries=(12, 16, 20, 28))
    )
    x = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
    mel = NpyDataSource(str(tmp_path), 1, train=True, test_size=0.25)
    ds = AudioDataset(x, mel)
    loader = MelFrameLoader(ds, cfg, batch_size=2, shuffle=True)
    widths = {b["x"].shape[2] for b in loader}
    assert len(widths) > 1  # multiple static bucket shapes in play
    assert all(w in (12, 16, 20, 28) for w in widths)
    assert all(w % 4 == 0 for w in widths)


def test_preprocess_chunked_numbering(tmp_path):
    """Chunked processing keeps global %05d numbering and spec order."""
    from neural_sound_generation_tpu.data.corpora.engine import (
        UtteranceSpec,
        preprocess_utterances,
    )

    sr = 22050
    rng = np.random.default_rng(0)
    specs = []
    for i in range(7):
        wav = (0.3 * rng.standard_normal(sr // 4 + 100 * i)).astype(np.float32)
        specs.append(UtteranceSpec(f"u{i}", f"text {i}",
                                   loader=(lambda w=wav: w)))
    cfg = AudioConfig()
    entries = preprocess_utterances(
        specs, str(tmp_path), cfg, name="chunked", chunk_size=3
    )
    assert len(entries) == 7
    for k, e in enumerate(entries):
        assert e.audio_path == f"chunked-audio-{k + 1:05d}.npy"
        assert e.text == f"text {k}"
        assert (tmp_path / e.audio_path).exists()


def test_device_prefetch(tmp_path):
    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.data.pipeline import device_prefetch

    batches = [{"x": np.full((2, 4), float(i), np.float32)} for i in range(5)]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert isinstance(b["x"], jnp.ndarray)
        assert float(b["x"][0, 0]) == float(i)

    # with an explicit sharding over the 8-device mesh
    from neural_sound_generation_tpu.parallel import batch_sharding, make_mesh

    mesh = make_mesh()
    big = [{"x": np.ones((8, 4), np.float32) * i} for i in range(3)]
    out = list(device_prefetch(iter(big), size=2, sharding=batch_sharding(mesh)))
    assert len(out) == 3
    from jax.sharding import PartitionSpec as P

    assert out[0]["x"].sharding.spec == P("data")


def test_shard_for_host_equal_batch_counts():
    """Regression: with a batch count not divisible by num_hosts, every
    host must still get the SAME number of batches (cyclic padding, the
    reference DistributedBucketingSampler semantics) — per-step pjit
    collectives are cross-host barriers, so one host with an extra batch
    hangs the pod at epoch end."""
    idx = list(range(52))  # 13 batches of 4 over 2 hosts
    shards = [shard_for_host(idx, 2, h, batch_size=4) for h in range(2)]
    assert len(shards[0]) == len(shards[1]) == 28  # 7 batches each
    assert set(shards[0]) | set(shards[1]) == set(idx)
    # element-wise path too
    el = [shard_for_host(list(range(7)), 2, h) for h in range(2)]
    assert len(el[0]) == len(el[1]) == 4


def test_loader_len_matches_iteration_without_drop_last(tmp_path):
    """Regression: __len__ must count the cyclically-padded final partial
    batch that iteration actually yields (10 items / batch 3 -> 4)."""
    _write_corpus(tmp_path, n=13)
    cfg = Config()
    x = NpyDataSource(str(tmp_path), 0, train=True, test_size=3 / 13)
    mel = NpyDataSource(str(tmp_path), 1, train=True, test_size=3 / 13)
    ds = AudioDataset(x, mel)
    assert len(ds) == 10
    loader = MelFrameLoader(
        ds, cfg, batch_size=3, shuffle=False, drop_last=False
    )
    n = sum(1 for _ in loader)
    assert n == len(loader) == 4
    dropping = MelFrameLoader(
        ds, cfg, batch_size=3, shuffle=False, drop_last=True
    )
    assert sum(1 for _ in dropping) == len(dropping) == 3


def test_loader_surfaces_producer_errors(tmp_path):
    """Regression: a data error inside the producer thread must RAISE in
    the consuming loop, not silently truncate the epoch (a corrupt shard
    at batch 3 of 5000 would otherwise 'train' on 3 batches forever)."""
    _write_corpus(tmp_path, n=16)
    cfg = Config()
    x = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
    mel = NpyDataSource(str(tmp_path), 1, train=True, test_size=0.25)

    class Failing(AudioDataset):
        def __getitem__(self, idx):
            if idx == 5:
                raise RuntimeError("corrupt shard")
            return super().__getitem__(idx)

    loader = MelFrameLoader(
        Failing(x, mel), cfg, batch_size=2, shuffle=False, num_workers=1,
        use_native=False,
    )
    with pytest.raises(RuntimeError, match="corrupt shard"):
        for _ in loader:
            pass


def test_abandoned_loader_iterator_releases_producer(tmp_path):
    """Regression: next(iter(loader)) (the CLI one-batch shape probe)
    must not leave the producer thread blocked on the bounded prefetch
    queue forever."""
    import threading
    import time

    _write_corpus(tmp_path, n=16)
    cfg = Config()
    x = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
    mel = NpyDataSource(str(tmp_path), 1, train=True, test_size=0.25)
    ds = AudioDataset(x, mel)
    loader = MelFrameLoader(ds, cfg, batch_size=2, shuffle=False)
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch (what garbage collection would do)
    deadline = time.time() + 10
    while time.time() < deadline:
        leaked = [
            t for t in threading.enumerate()
            if t not in before and t.is_alive()
        ]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"producer thread leaked: {leaked}"


def test_config_parse_list_values():
    """Regression: Config.parse must treat commas inside JSON lists as
    part of the value (tf.HParams list semantics) — upsample_scales
    overrides crashed with 'unknown preset key' before."""
    cfg = Config().parse("upsample_scales=[2,2,4,4],fmin=25,batch_size=3")
    assert tuple(cfg.arch.upsample_scales) == (2, 2, 4, 4)
    assert cfg.audio.fmin == 25
    assert cfg.train.batch_size == 3


def test_collate_input_lengths_exclude_padding():
    """Regression: input_lengths must count only audio actually copied
    into the batch — not up to hop-1 (or n_frames-capped: arbitrarily
    many) pad samples, which the vocoder loss mask would then train on."""
    from neural_sound_generation_tpu.data.collate import collate_mel_batch

    cfg = AudioConfig()
    hop = cfg.effective_hop_size
    rng = np.random.default_rng(0)
    # 10 mel frames + 100 extra samples that have no mel frame
    audio = rng.standard_normal(10 * hop + 100).astype(np.float32)
    mel = rng.standard_normal((10, 80)).astype(np.float32)
    out = collate_mel_batch(
        [(audio, mel, None)], cfg, max_time_steps=20 * hop, rng=rng
    )
    assert int(out["input_lengths"][0]) == 10 * hop


def test_set_epoch_replays_shuffle_order(tmp_path):
    """Data order is a pure function of (seed, epoch): a fresh loader
    pinned with set_epoch(e) reproduces bit-for-bit the batches the
    e-th pass of an uninterrupted loader yields — the property --resume
    relies on (the reference's process-stateful samplers cannot replay,
    dataloader.py:158-202)."""
    _write_corpus(tmp_path, n=16)
    cfg = Config()

    def fresh_loader():
        x = NpyDataSource(str(tmp_path), 0, train=True, test_size=0.25)
        mel = NpyDataSource(str(tmp_path), 1, train=True, test_size=0.25)
        return MelFrameLoader(AudioDataset(x, mel), cfg, batch_size=2,
                              shuffle=True, seed=7)

    def fingerprint(loader):
        return [np.asarray(b["x"]).copy() for b in loader]

    cont = fresh_loader()
    passes = [fingerprint(cont) for _ in range(3)]  # epochs 0, 1, 2

    # shuffling actually varies across epochs (crop offsets + order)
    assert not all(
        a.shape == b.shape and np.array_equal(a, b)
        for a, b in zip(passes[0], passes[2])
    )

    resumed = fresh_loader()
    resumed.set_epoch(2)  # an uninterrupted run's 3rd pass
    replay = fingerprint(resumed)
    assert len(replay) == len(passes[2])
    for a, b in zip(passes[2], replay):
        np.testing.assert_array_equal(a, b)

    # and set_epoch pins only the NEXT pass; iteration advances from there
    after = fingerprint(resumed)  # epoch 3 — not a repeat of epoch 2
    assert not all(
        a.shape == b.shape and np.array_equal(a, b)
        for a, b in zip(replay, after)
    )
