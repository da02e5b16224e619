"""CLI surface tests: the two public entry points end-to-end on synthetic
corpora (the reference's API *is* these commands, SURVEY §1)."""

import gzip
import os
import struct

import numpy as np
import pytest

import jax

from neural_sound_generation_tpu.cli import main as train_cli
from neural_sound_generation_tpu.cli import preprocess as preprocess_cli
from neural_sound_generation_tpu.data.images import load_mnist
from neural_sound_generation_tpu.ops import dsp


def _make_ljspeech(tmp_path, n=8, sr=22050):
    wav_dir = tmp_path / "wavs"
    wav_dir.mkdir(parents=True)
    lines = []
    for i in range(n):
        dur = 0.4 + 0.1 * i
        t = np.arange(int(sr * dur)) / sr
        wav = (0.5 * np.sin(2 * np.pi * (220 + 30 * i) * t)).astype(np.float32)
        dsp.save_wav(wav, str(wav_dir / f"LJ-{i:04d}.wav"), sr)
        lines.append(f"LJ-{i:04d}|raw {i}|text {i}")
    (tmp_path / "metadata.csv").write_text("\n".join(lines), encoding="utf-8")
    return tmp_path


def test_preprocess_cli_end_to_end(tmp_path, capsys):
    in_dir = _make_ljspeech(tmp_path / "in")
    out_dir = tmp_path / "out"
    preprocess_cli.main(
        ["ljspeech", str(in_dir), str(out_dir), "--num_workers", "2"]
    )
    out = capsys.readouterr().out
    assert "Wrote 8 utterances" in out
    assert (out_dir / "train.txt").exists()
    assert (out_dir / "ljspeech-audio-00001.npy").exists()
    assert (out_dir / "ljspeech-mel-00008.npy").exists()


def test_preprocess_cli_with_reference_preset(tmp_path):
    ref_preset = "/root/reference/src/presets/cmu_arctic_8bit.json"
    if not os.path.exists(ref_preset):
        pytest.skip("reference not mounted")
    in_dir = _make_ljspeech(tmp_path / "in", n=3, sr=16000)
    out_dir = tmp_path / "out"
    preprocess_cli.main(
        ["ljspeech", str(in_dir), str(out_dir), "--preset", ref_preset]
    )
    audio = np.load(out_dir / "ljspeech-audio-00001.npy")
    assert audio.dtype == np.int16  # mulaw-quantize preset applied


def test_preprocess_cli_hparams_override(tmp_path):
    in_dir = _make_ljspeech(tmp_path / "in", n=2)
    out_dir = tmp_path / "out"
    preprocess_cli.main(
        ["ljspeech", str(in_dir), str(out_dir), "--n_mels", "40"]
    )
    mel = np.load(out_dir / "ljspeech-mel-00001.npy")
    assert mel.shape[1] == 40


def test_train_cli_interval_checkpointing(tmp_path):
    """cfg.train.checkpoint_interval-step saves fire from the train CLI
    mid-epoch (the reference configures the interval, hparams.py:122,
    but never consumes it) — async writes included."""
    import json

    in_dir = _make_ljspeech(tmp_path / "in", n=8)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    preset = tmp_path / "p.json"
    preset.write_text(json.dumps({"checkpoint_interval": 2}))
    ckptdir = tmp_path / "models"
    train_cli.main([
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir), "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(ckptdir), "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--preset", str(preset),
    ])
    from neural_sound_generation_tpu.training import checkpoint as ckpt_mod

    ckpt = str(ckptdir / "vqvae" / "checkpoint_ljspeech_8_16")
    steps = sorted(
        int(d.split("_")[1]) for d in os.listdir(ckpt) if d.startswith("step_")
    )
    # 3 train batches -> interval saves at steps 2 (+ the epoch-end save
    # at 3); every dir must be restorable (async writes landed)
    assert 2 in steps and steps[-1] == 3
    assert ckpt_mod.latest_step(ckpt) == steps[-1]

    # the mid-epoch interval save stores the last COMPLETED epoch (0
    # here), not the in-progress one: --resume computes start_epoch =
    # stored + 1, so a preemption mid-epoch replays the interrupted
    # epoch with its pinned shuffle order instead of skipping its tail
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        mid = ckptr.restore(os.path.join(ckpt, "step_2"))["extra"]
        end = ckptr.restore(os.path.join(ckpt, "step_3"))["extra"]
    assert int(mid["epoch"]) == 0
    assert int(end["epoch"]) == 1


def test_train_cli_flags_thread_into_config():
    """--ema-warmup / --bf16-moments must land in TrainConfig (they once
    existed only as unreachable config fields)."""
    from neural_sound_generation_tpu.cli.main import build_config, parse_args

    base = ["--model", "vqvae", "--dataset", "ljspeech", "--datadir", "/x"]
    cfg = build_config(parse_args(base))
    assert not cfg.train.ema_warmup and not cfg.train.bf16_moments
    cfg = build_config(parse_args(base + ["--ema-warmup", "--bf16-moments"]))
    assert cfg.train.ema_warmup and cfg.train.bf16_moments


def test_train_cli_ljspeech_vqvae(tmp_path):
    """Full reference workflow: preprocess then train
    (``main.py --model vqvae --dataset ljspeech``), 2 epochs on a tiny
    corpus, with checkpoint + artifact dumps + resume."""
    in_dir = _make_ljspeech(tmp_path / "in", n=8)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])

    sampledir = tmp_path / "results"
    ckptdir = tmp_path / "models"
    argv = [
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(sampledir),
        "--ckpt-dir", str(ckptdir),
        "--batch-size", "2", "--epochs", "2",
        "--dim", "8", "--z-dim", "16",
        "--max-batches-per-epoch", "2",
    ]
    train_cli.main(argv)
    # checkpoints in the reference's directory layout
    ckpt = ckptdir / "vqvae" / "checkpoint_ljspeech_8_16"
    assert ckpt.exists()
    # per-epoch artifacts: reconstruction .npy + Griffin-Lim .wav
    arts = os.listdir(sampledir / "ljspeech")
    assert any(a.startswith("reconstruction_vqvae") for a in arts)
    assert any(a.startswith("audio_recon_vqvae") and a.endswith(".wav") for a in arts)

    # resume continues from the saved epoch
    train_cli.main(argv + ["--resume", "--epochs", "3"])


def test_train_cli_vae(tmp_path):
    in_dir = _make_ljspeech(tmp_path / "in", n=6)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "vae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "4",
        "--max-batches-per-epoch", "2",
    ])


def _make_mnist(tmp_path, n=32):
    raw = tmp_path / "MNIST" / "raw"
    raw.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for prefix, count in (("train", n), ("t10k", n // 2)):
        images = rng.integers(0, 256, (count, 28, 28), dtype=np.uint8)
        labels = rng.integers(0, 10, count, dtype=np.uint8)
        with gzip.open(raw / f"{prefix}-images-idx3-ubyte.gz", "wb") as f:
            f.write(struct.pack(">IIII", 2051, count, 28, 28) + images.tobytes())
        with gzip.open(raw / f"{prefix}-labels-idx1-ubyte.gz", "wb") as f:
            f.write(struct.pack(">II", 2049, count) + labels.tobytes())
    return tmp_path


def test_mnist_reader(tmp_path):
    _make_mnist(tmp_path)
    x, y = load_mnist(str(tmp_path))
    assert x.shape == (32, 28, 28, 1) and x.max() <= 1.0
    assert y.shape == (32,)


def test_train_cli_mnist_vqvae(tmp_path):
    _make_mnist(tmp_path)
    train_cli.main([
        "--model", "vqvae", "--dataset", "MNIST",
        "--datadir", str(tmp_path),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "8", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
    ])
    assert (tmp_path / "models" / "vqvae" / "checkpoint_MNIST_8_16").exists()


def test_train_cli_wavevqvae(tmp_path):
    """BASELINE config #3: mu-law raw-waveform VQ-VAE via the CLI."""
    in_dir = _make_ljspeech(tmp_path / "in", n=6)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "wavevqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "16", "--z-dim", "32",
        "--max-batches-per-epoch", "2",
    ])
    arts = os.listdir(tmp_path / "results" / "ljspeech")
    assert any(a.startswith("audio_recon_wavevqvae") for a in arts)


def _make_cmu_arctic(tmp_path, per_speaker=2, sr=16000):
    """Synthetic CMU-Arctic-layout corpus: 7 speaker dirs with wavs."""
    from neural_sound_generation_tpu.data.corpora.cmu_arctic import SPEAKERS

    for spk in SPEAKERS:
        wav_dir = tmp_path / f"cmu_us_{spk}_arctic" / "wav"
        wav_dir.mkdir(parents=True)
        base = 150 + 30 * SPEAKERS.index(spk)
        for i in range(per_speaker):
            t = np.arange(int(sr * 0.6)) / sr
            wav = (0.5 * np.sin(2 * np.pi * (base + 10 * i) * t)).astype(np.float32)
            dsp.save_wav(wav, str(wav_dir / f"arctic_a{i:04d}.wav"), sr)
    return tmp_path


def test_cmu_arctic_multispeaker_end_to_end(tmp_path):
    """BASELINE config #4: CMU Arctic multi-speaker VQ-VAE with a
    speaker-conditioned decoder, via the CLIs with the reference's own
    multispeaker preset."""
    in_dir = _make_cmu_arctic(tmp_path / "in")
    out_dir = tmp_path / "out"
    preset = "/root/reference/src/presets/multispeaker_cmu_arctic_mixture.json"
    if not os.path.exists(preset):
        pytest.skip("reference not mounted")
    preprocess_cli.main([
        "cmu_arctic", str(in_dir), str(out_dir), "--preset", preset,
    ])
    # manifest carries 5 columns (speaker ids)
    from neural_sound_generation_tpu.data import read_manifest

    entries = read_manifest(str(out_dir))
    assert len(entries) == 14
    assert sorted({e.speaker_id for e in entries}) == list(range(7))

    # train with speaker conditioning (gin_channels=16 from the preset)
    train_cli.main([
        "--model", "vqvae", "--dataset", "cmu_arctic",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--preset", preset,
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
        "--max-batches-per-epoch", "3",
    ])
    assert (tmp_path / "models" / "vqvae" / "checkpoint_cmu_arctic_8_16").exists()
    arts = os.listdir(tmp_path / "results" / "cmu_arctic")
    assert any(a.endswith(".wav") for a in arts)

    # ---- full multi-speaker chain (round-4 verdict item 3): prior with
    # speaker labels -> per-speaker ancestral samples through the
    # speaker-conditioned decoder -> speaker-conditioned WaveNet ->
    # per-speaker synthesis
    from neural_sound_generation_tpu.cli import prior as prior_cli
    from neural_sound_generation_tpu.cli import vocoder as vocoder_cli

    vq_ckpt = str(tmp_path / "models" / "vqvae" / "checkpoint_cmu_arctic_8_16")
    prior_ckpt = str(tmp_path / "prior_ms")
    prior_cli.main([
        "train", "--datadir", str(out_dir), "--vqvae-ckpt", vq_ckpt,
        "--ckpt-dir", prior_ckpt, "--preset", preset,
        "--dim", "8", "--z-dim", "16",
        "--prior-dim", "8", "--prior-layers", "2", "--n-classes", "7",
        "--batch-size", "2", "--epochs", "1", "--max-batches-per-epoch", "2",
    ])
    # sample as two different speakers; label == speaker id drives BOTH
    # the prior's class conditioning and the decoder's speaker embedding
    for spk in (0, 3):
        sample_dir = str(tmp_path / f"ms_samples_{spk}")
        prior_cli.main([
            "sample", "--vqvae-ckpt", vq_ckpt, "--prior-ckpt", prior_ckpt,
            "--output-dir", sample_dir, "--preset", preset,
            "--dim", "8", "--z-dim", "16",
            "--prior-dim", "8", "--prior-layers", "2", "--n-classes", "7",
            "--code-shape", "20", "5", "--num-samples", "1",
            "--label", str(spk),
        ])
        assert any(
            f.endswith(".wav") for f in os.listdir(sample_dir)
        )

    wn_ckpt = str(tmp_path / "wn_ms")
    vocoder_cli.main([
        "train", "--datadir", str(out_dir), "--ckpt-dir", wn_ckpt,
        "--preset", preset, "--batch-size", "2", "--epochs", "1",
        "--layers", "2", "--stacks", "1", "--residual-channels", "8",
        "--max-batches-per-epoch", "2",
    ])
    mel = sorted((out_dir).glob("*-mel-*.npy"))[0]
    wav_out = tmp_path / "ms_syn.wav"
    vocoder_cli.main([
        "synthesize", "--ckpt-dir", wn_ckpt, "--mel-npy", str(mel),
        "--output", str(wav_out), "--preset", preset,
        "--layers", "2", "--stacks", "1", "--residual-channels", "8",
        "--max-frames", "4", "--speaker-id", "3",
    ])
    assert wav_out.exists()

    # a speaker-conditioned checkpoint without --speaker-id is loud
    with pytest.raises(SystemExit, match="speaker-conditioned"):
        vocoder_cli.main([
            "synthesize", "--ckpt-dir", wn_ckpt, "--mel-npy", str(mel),
            "--output", str(tmp_path / "nope.wav"), "--preset", preset,
            "--layers", "2", "--stacks", "1", "--residual-channels", "8",
            "--max-frames", "4",
        ])


def test_codebook_init_data_cli(tmp_path, capsys):
    """--codebook-init data seeds the codebook from a warmup batch's
    encoder outputs through the production train CLI (wave family,
    where the uniform-init collapse was measured)."""
    in_dir = _make_ljspeech(tmp_path / "in", n=4)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "wavevqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--num-downsample", "3",
        "--max-batches-per-epoch", "2",
        "--codebook-init", "data", "--ema-codebook",
    ])
    out = capsys.readouterr().out
    assert "codebook seeded from encoder outputs" in out
    assert (
        tmp_path / "models" / "wavevqvae" / "checkpoint_ljspeech_8_16"
    ).exists()


def test_units_wavenet_decode_chain_cli(tmp_path):
    """Round-5: the units -> WaveNet decode chain — a frozen WaveVQVAE's
    quantized latents condition the autoregressive vocoder
    (`cli.vocoder train --condition units`), closing the raw-waveform
    family's conditional-mean decoder ceiling (PERF.md wave soak).
    Train the unit model, train the conditioned WaveNet, then
    resynthesize a corpus wav through wav -> units -> WaveNet."""
    from neural_sound_generation_tpu.cli import vocoder as vocoder_cli
    from neural_sound_generation_tpu.training import checkpoint

    in_dir = _make_ljspeech(tmp_path / "in", n=4)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "wavevqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--num-downsample", "3",
        "--max-batches-per-epoch", "2",
    ])
    units_ckpt = str(
        tmp_path / "models" / "wavevqvae" / "checkpoint_ljspeech_8_16"
    )
    units = [
        "--condition", "units", "--units-vqvae-ckpt", units_ckpt,
        "--units-dim", "8", "--units-z-dim", "16",
        "--units-downsample", "3",
    ]
    wn_ckpt = str(tmp_path / "wn_units")
    vocoder_cli.main([
        "train", "--datadir", str(out_dir), "--ckpt-dir", wn_ckpt,
        "--batch-size", "2", "--epochs", "1",
        "--layers", "2", "--stacks", "1", "--residual-channels", "8",
        "--max-batches-per-epoch", "2",
    ] + units)
    assert checkpoint.latest_step(wn_ckpt) is not None
    src = sorted((in_dir / "wavs").glob("*.wav"))[0]
    wav_out = tmp_path / "resynth.wav"
    vocoder_cli.main([
        "synthesize", "--ckpt-dir", wn_ckpt, "--wav-in", str(src),
        "--output", str(wav_out),
        "--layers", "2", "--stacks", "1", "--residual-channels", "8",
        "--max-frames", "6",
    ] + units)
    assert wav_out.exists()
    from neural_sound_generation_tpu.ops import dsp as _dsp

    w = np.asarray(_dsp.load_wav(str(wav_out), 22050))
    assert w.size == 6 * 8  # 6 unit frames x hop 8
    assert np.isfinite(w).all()

    # units conditioning composes with pipeline parallelism: the unit
    # latents ride the same broadcast path as mels, stages shard as
    # usual (2-stage pipe on the virtual CPU mesh)
    wn_pp_ckpt = str(tmp_path / "wn_units_pp")
    vocoder_cli.main([
        "train", "--datadir", str(out_dir), "--ckpt-dir", wn_pp_ckpt,
        "--batch-size", "2", "--epochs", "1",
        "--layers", "2", "--stacks", "2", "--residual-channels", "8",
        "--max-batches-per-epoch", "2", "--mesh-pipe", "2",
    ] + units)
    assert checkpoint.latest_step(wn_pp_ckpt) is not None

    # the checkpoint records its conditioning chain: mismatched (or
    # forgotten) --units-* flags fail loudly instead of silently
    # grafting a wrong-architecture model
    with pytest.raises(SystemExit, match="units_downsample"):
        vocoder_cli.main([
            "synthesize", "--ckpt-dir", wn_ckpt, "--wav-in", str(src),
            "--output", str(tmp_path / "nope.wav"),
            "--layers", "2", "--stacks", "1", "--residual-channels", "8",
            "--max-frames", "6",
            "--condition", "units", "--units-vqvae-ckpt", units_ckpt,
            "--units-dim", "8", "--units-z-dim", "16",
            "--units-downsample", "4",  # trained with 3
        ])
    with pytest.raises(SystemExit, match="--condition"):
        vocoder_cli.main([
            "synthesize", "--ckpt-dir", wn_ckpt,
            "--mel-npy", str(sorted(out_dir.glob("*-mel-*.npy"))[0]),
            "--output", str(tmp_path / "nope2.wav"),
            "--layers", "2", "--stacks", "1", "--residual-channels", "8",
            "--max-frames", "6",
        ])


def test_wave_soak_quick(tmp_path, capsys):
    """CI pin of the wave-domain soak CLI sequence (BASELINE config #3):
    scripts/wave_soak.py --quick runs all three arms — mu-law float
    WaveVQVAE, the RVQ arm, and the 8-bit mulaw-quantize preset — at
    tiny sizes, emitting the summary JSON line PERF.md's full-size run
    records."""
    import importlib.util as _ilu
    import json as _json

    spec = _ilu.spec_from_file_location(
        "wave_soak",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "wave_soak.py",
        ),
    )
    mod = _ilu.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(["--quick", "--workdir", str(tmp_path / "soak")])
    lines = [
        _json.loads(line)
        for line in capsys.readouterr().out.splitlines()
        if line.startswith("{")
    ]
    summary = [e for e in lines if e["phase"] == "summary"]
    assert len(summary) == 1
    s = summary[0]
    assert np.isfinite(s["mulaw"]["heldout_mulaw_mse"])
    assert np.isfinite(s["mulaw_16x"]["heldout_mulaw_mse"])
    assert np.isfinite(s["mulaw_quantize_8bit"]["heldout_ce_bits"])
    assert "stage1" in s["rvq"]["codebook"]
    # audible artifacts exist for every arm
    for tag in ("audio_mulaw", "audio_mulaw_16x", "audio_rvq", "audio_8bit"):
        assert any(
            f.endswith(".wav")
            for f in os.listdir(tmp_path / "soak" / tag)
        ), tag


def test_pp_composes_with_conditioning_cli(tmp_path):
    """Round-5: the three round-4 PP SystemExit guards are gone — the
    multispeaker vocoder (speaker embeddings), the switch-MoE prior
    (load-balance aux across stages), and the hier-bottom prior
    (spatial conditioning) all train under --mesh-pipe through the
    production CLIs, and the PP-trained artifacts restore on the
    downstream dense surfaces (synthesize / sample templates)."""
    from neural_sound_generation_tpu.cli import prior as prior_cli
    from neural_sound_generation_tpu.cli import vocoder as vocoder_cli
    from neural_sound_generation_tpu.training import checkpoint

    preset = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "neural_sound_generation_tpu", "config", "presets",
        "multispeaker_cmu_arctic_mixture.json",
    )
    in_dir = _make_cmu_arctic(tmp_path / "in", per_speaker=2)
    out_dir = tmp_path / "out_ms"
    preprocess_cli.main([
        "cmu_arctic", str(in_dir), str(out_dir), "--preset", preset,
    ])

    # (a) speaker-conditioned WaveNet under PP: gin embedding rides the
    # broadcast, per-layer g convs staged; the dense artifact then
    # synthesizes per speaker through the ordinary CLI
    wn_ckpt = str(tmp_path / "wn_pp_ms")
    vocoder_cli.main([
        "train", "--datadir", str(out_dir), "--ckpt-dir", wn_ckpt,
        "--preset", preset, "--batch-size", "2", "--epochs", "1",
        "--layers", "2", "--stacks", "2", "--residual-channels", "8",
        "--max-batches-per-epoch", "2", "--mesh-pipe", "2",
    ])
    assert checkpoint.latest_step(wn_ckpt) is not None
    mel = sorted(out_dir.glob("*-mel-*.npy"))[0]
    wav_out = tmp_path / "pp_ms_syn.wav"
    vocoder_cli.main([
        "synthesize", "--ckpt-dir", wn_ckpt, "--mel-npy", str(mel),
        "--output", str(wav_out), "--preset", preset,
        "--layers", "2", "--stacks", "2", "--residual-channels", "8",
        "--max-frames", "4", "--speaker-id", "5",
    ])
    assert wav_out.exists()

    # (b) switch-MoE transformer prior under PP (aux collected across
    # stages); needs a VQ-VAE for code extraction
    train_cli.main([
        "--model", "vqvae", "--dataset", "cmu_arctic",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--preset", preset, "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
    ])
    vq_ckpt = str(
        tmp_path / "models" / "vqvae" / "checkpoint_cmu_arctic_8_16"
    )
    moe_ckpt = str(tmp_path / "moe_pp_prior")
    prior_cli.main([
        "train", "--datadir", str(out_dir), "--vqvae-ckpt", vq_ckpt,
        "--ckpt-dir", moe_ckpt, "--preset", preset,
        "--dim", "8", "--z-dim", "16", "--arch", "transformer",
        "--moe-experts", "2", "--prior-dim", "16", "--prior-layers", "2",
        "--n-classes", "7", "--batch-size", "2", "--epochs", "1",
        "--max-batches-per-epoch", "2", "--mesh-pipe", "2",
    ])
    assert checkpoint.latest_step(moe_ckpt) is not None

    # (c) hier-bottom prior under PP (spatial conditioning through the
    # replicated embedding)
    lj_in = _make_ljspeech(tmp_path / "lj_in", n=4)
    lj_out = tmp_path / "lj_out"
    preprocess_cli.main(["ljspeech", str(lj_in), str(lj_out)])
    train_cli.main([
        "--model", "hiervqvae", "--dataset", "ljspeech",
        "--datadir", str(lj_out),
        "--sampledir", str(tmp_path / "results_hier"),
        "--ckpt-dir", str(tmp_path / "models_hier"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
    ])
    hier_ckpt = str(
        tmp_path / "models_hier" / "hiervqvae" / "checkpoint_ljspeech_8_16"
    )
    bottom_ckpt = str(tmp_path / "bottom_pp_prior")
    prior_cli.main([
        "train", "--datadir", str(lj_out), "--vqvae-ckpt", hier_ckpt,
        "--ckpt-dir", bottom_ckpt, "--hier", "--hier-level", "bottom",
        "--dim", "8", "--z-dim", "16", "--arch", "transformer",
        "--prior-dim", "16", "--prior-layers", "2",
        "--batch-size", "2", "--epochs", "1",
        "--max-batches-per-epoch", "2", "--mesh-pipe", "2",
    ])
    assert checkpoint.latest_step(bottom_ckpt) is not None


def test_speaker_filtered_training(tmp_path):
    """--speaker-id trains on a single speaker's slice (dataloader.py
    speaker filter semantics)."""
    in_dir = _make_cmu_arctic(tmp_path / "in", per_speaker=3)
    out_dir = tmp_path / "out"
    preprocess_cli.main([
        "cmu_arctic", str(in_dir), str(out_dir), "--sample_rate", "16000",
    ])
    train_cli.main([
        "--model", "vqvae", "--dataset", "cmu_arctic",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--speaker-id", "2",
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
        "--max-batches-per-epoch", "2",
    ])


def test_evaluate_cli(tmp_path):
    """Standalone evaluation of a saved checkpoint (test.py parity)."""
    from neural_sound_generation_tpu.cli import evaluate as evaluate_cli

    in_dir = _make_ljspeech(tmp_path / "in", n=8)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    ckptdir = tmp_path / "models"
    train_cli.main([
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir), "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(ckptdir), "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
    ])
    dump = str(tmp_path / "recon.npy")
    evaluate_cli.main([
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--ckpt-dir", str(ckptdir / "vqvae" / "checkpoint_ljspeech_8_16"),
        "--batch-size", "2", "--dim", "8", "--z-dim", "16",
        "--dump-npy", dump,
    ])
    assert os.path.exists(dump)
    recon = np.load(dump)
    assert recon.ndim == 4 and np.isfinite(recon).all()

    # --no-ema evaluates the live training params instead of the averaged
    # model; after 2 steps of decay-0.9999 EMA the shadow is ~at init, so
    # the reconstructions must differ from the EMA-default pass above
    dump_live = str(tmp_path / "recon_live.npy")
    evaluate_cli.main([
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--ckpt-dir", str(ckptdir / "vqvae" / "checkpoint_ljspeech_8_16"),
        "--batch-size", "2", "--dim", "8", "--z-dim", "16",
        "--dump-npy", dump_live, "--no-ema",
    ])
    recon_live = np.load(dump_live)
    assert recon_live.shape == recon.shape
    assert not np.allclose(recon_live, recon)


def test_evaluate_cli_rvq_wavevqvae(tmp_path, caplog):
    """Round-5: evaluate restores RVQ / non-default-downsample wave
    checkpoints with a MATCHING template (--num-quantizers /
    --num-downsample were previously hardcoded to the defaults, so an
    RVQ codebook silently grafted fresh-init weights)."""
    import logging

    from neural_sound_generation_tpu.cli import evaluate as evaluate_cli

    in_dir = _make_ljspeech(tmp_path / "in", n=6)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    ckptdir = tmp_path / "models"
    train_cli.main([
        "--model", "wavevqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir), "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(ckptdir), "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
        "--num-quantizers", "2", "--num-downsample", "4",
    ])
    with caplog.at_level(logging.WARNING, logger="nsg.checkpoint"):
        evaluate_cli.main([
            "--model", "wavevqvae", "--dataset", "ljspeech",
            "--datadir", str(out_dir),
            "--ckpt-dir",
            str(ckptdir / "wavevqvae" / "checkpoint_ljspeech_8_16"),
            "--batch-size", "2", "--dim", "8", "--z-dim", "16",
            "--num-quantizers", "2", "--num-downsample", "4",
        ])
    fills = [r for r in caplog.records if "missing" in r.getMessage()]
    assert not fills, [r.getMessage() for r in fills]


def test_evaluate_cli_mesh(tmp_path, monkeypatch, capsys):
    """--mesh-data/--mesh-model on the evaluate CLI (round-4 verdict
    item 6): a TP-trained checkpoint evaluates under the 'model'-axis
    layout it trained with — params committed sharded, batch dp-sharded
    — and the metrics match the replicated eval."""
    import json

    import jax

    import neural_sound_generation_tpu.training as training_mod
    from neural_sound_generation_tpu.cli import evaluate as evaluate_cli

    in_dir = _make_ljspeech(tmp_path / "in", n=8)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    ckptdir = tmp_path / "models"
    train_cli.main([
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir), "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(ckptdir), "--batch-size", "4", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
        "--mesh-data", "2", "--mesh-model", "2",
    ])
    ckpt = str(ckptdir / "vqvae" / "checkpoint_ljspeech_8_16")

    def run(extra_args):
        capsys.readouterr()
        evaluate_cli.main([
            "--model", "vqvae", "--dataset", "ljspeech",
            "--datadir", str(out_dir), "--ckpt-dir", ckpt,
            "--batch-size", "4", "--dim", "8", "--z-dim", "16",
        ] + extra_args)
        out = capsys.readouterr().out
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        return json.loads(line)

    captured = {}
    real_trainer = training_mod.Trainer

    def capturing_trainer(*a, **kw):
        t = real_trainer(*a, **kw)
        captured["trainer"] = t
        return t

    monkeypatch.setattr(training_mod, "Trainer", capturing_trainer)
    # evaluate_cli imports Trainer from the package at call time? no —
    # it imports the name directly; patch the module it resolves from
    monkeypatch.setattr(
        "neural_sound_generation_tpu.training.Trainer", capturing_trainer
    )
    mesh_means = run(["--mesh-data", "2", "--mesh-model", "2"])
    trainer = captured["trainer"]
    assert trainer.tensor_parallel
    assert trainer.mesh is not None and dict(trainer.mesh.shape) == {
        "data": 2, "model": 2,
    }
    # the restored codebook is committed to its trained 'model' sharding
    assert "model" in trainer.state.params["codebook"].sharding.spec
    for shard in trainer.state.params["codebook"].addressable_shards:
        assert shard.data.shape[0] == 8  # 16 codes over 2 model shards

    monkeypatch.setattr(
        "neural_sound_generation_tpu.training.Trainer", real_trainer
    )
    plain_means = run([])
    for k in plain_means:
        assert abs(mesh_means[k] - plain_means[k]) < 1e-3, (
            k, mesh_means[k], plain_means[k],
        )


def _make_cifar10(tmp_path, n=24):
    import pickle

    base = tmp_path / "cifar-10-batches-py"
    base.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for name, count in [("data_batch_1", n), ("test_batch", n // 2)]:
        d = {
            b"data": rng.integers(0, 256, (count, 3072), dtype=np.uint8),
            b"labels": rng.integers(0, 10, count).tolist(),
        }
        with open(base / name, "wb") as f:
            pickle.dump(d, f)
    return tmp_path


def test_cifar10_reader_and_training(tmp_path):
    from neural_sound_generation_tpu.data.images import load_cifar10

    _make_cifar10(tmp_path)
    x, y = load_cifar10(str(tmp_path))
    assert x.shape == (24, 32, 32, 3) and x.max() <= 1.0
    train_cli.main([
        "--model", "vqvae", "--dataset", "CIFAR10",
        "--datadir", str(tmp_path),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "8", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
    ])
    assert (tmp_path / "models" / "vqvae" / "checkpoint_CIFAR10_8_16").exists()


def test_train_cli_bf16(tmp_path):
    """--bf16 trains with bfloat16 compute; the checkpoint stays f32 and
    restores into the default (f32) model."""
    import numpy as np

    in_dir = _make_ljspeech(tmp_path / "in", n=4)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    argv = [
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
        "--max-batches-per-epoch", "2", "--bf16",
    ]
    train_cli.main(argv)

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    model = VQVAE(input_dim=1, dim=8, z_dim=16)  # default f32
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 16, 1)), train=False)
    state = create_train_state(v, Config().train)
    restored, _ = checkpoint.restore(
        str(tmp_path / "models" / "vqvae" / "checkpoint_ljspeech_8_16"), state
    )
    assert restored.params["codebook"].dtype == np.float32


def test_wavenet_variant_corpora_force_audio_py_convention(tmp_path):
    """cmu_arctic/jsut/librivox are bound to the reference's audio.py
    chain: LWS STFT and NO preemphasis (audio.py:94-101 transforms the
    raw signal; wavenet hparams.py has no preemphasis key). The corpus
    adapter must force that convention over any caller config —
    identical output whether the caller's cfg asks for preemphasis or
    not."""
    import dataclasses

    from neural_sound_generation_tpu.config import AudioConfig
    from neural_sound_generation_tpu.data.corpora import cmu_arctic
    from neural_sound_generation_tpu.data.corpora.engine import convention

    base = AudioConfig(sample_rate=16000, preemphasize=True, use_lws=False)
    conv = convention(base)
    assert conv.use_lws is True
    assert conv.preemphasize is False
    assert conv.sample_rate == 16000  # other knobs untouched

    in_dir = _make_cmu_arctic(tmp_path / "in", per_speaker=1)
    out_a = tmp_path / "out_a"
    out_b = tmp_path / "out_b"
    cmu_arctic.build_from_path(
        str(in_dir), str(out_a), num_workers=1,
        cfg=dataclasses.replace(base, preemphasize=True),
    )
    cmu_arctic.build_from_path(
        str(in_dir), str(out_b), num_workers=1,
        cfg=dataclasses.replace(base, preemphasize=False),
    )
    mels_a = sorted(p for p in os.listdir(out_a) if "mel" in p)
    mels_b = sorted(p for p in os.listdir(out_b) if "mel" in p)
    assert mels_a and mels_a == mels_b
    for name in mels_a:
        np.testing.assert_array_equal(
            np.load(os.path.join(out_a, name)),
            np.load(os.path.join(out_b, name)),
        )


def test_jsut_librivox_share_audio_py_convention(tmp_path, monkeypatch):
    """jsut/librivox FORCE the audio.py convention (LWS on, preemphasis
    off) over whatever cfg the caller passes — verified by capturing the
    cfg each adapter actually hands to the preprocessing engine."""
    import dataclasses

    from neural_sound_generation_tpu.config import AudioConfig
    from neural_sound_generation_tpu.data.corpora import jsut, librivox

    caller_cfg = AudioConfig(
        sample_rate=24000, preemphasize=True, use_lws=False
    )
    for mod in (jsut, librivox):
        seen = {}

        def capture(specs, out_dir, cfg, **kw):
            seen["cfg"] = cfg
            return []

        monkeypatch.setattr(mod, "preprocess_utterances", capture)
        in_dir = tmp_path / mod.__name__.rsplit(".", 1)[-1]
        in_dir.mkdir()  # empty corpus: collect() yields no specs
        mod.build_from_path(str(in_dir), str(tmp_path / "out"),
                            num_workers=1, cfg=caller_cfg)
        got = seen["cfg"]
        assert got.use_lws is True, mod.__name__
        assert got.preemphasize is False, mod.__name__
        assert got.sample_rate == 24000  # caller knobs otherwise kept


def test_train_cli_mesh_model_engages_tensor_parallel(tmp_path, monkeypatch):
    """Round-3 verdict item #1: ``--mesh-model 2`` on the production train
    CLI must actually shard the state over the 'model' axis (it used to
    silently just halve data parallelism). Captures the Trainer the CLI
    builds and inspects its live state."""
    import neural_sound_generation_tpu.cli.main as main_mod

    in_dir = _make_ljspeech(tmp_path / "in", n=8)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])

    captured = {}
    real_trainer = main_mod.Trainer

    def capturing_trainer(*a, **kw):
        t = real_trainer(*a, **kw)
        captured["trainer"] = t
        return t

    monkeypatch.setattr(main_mod, "Trainer", capturing_trainer)
    train_cli.main([
        "--model", "vqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "4", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
        "--max-batches-per-epoch", "2",
        "--mesh-data", "4", "--mesh-model", "2",
    ])
    trainer = captured["trainer"]
    assert trainer.tensor_parallel
    assert dict(trainer.mesh.shape) == {"data": 4, "model": 2}
    # codebook rows sharded over 'model' on the LIVE post-training state
    assert "model" in trainer.state.params["codebook"].sharding.spec
    # per-leaf moments mirror it (CLI auto-selected fused=False under TP)
    assert "model" in trainer.state.opt_state[0].mu["codebook"].sharding.spec
    kernels = [
        l for l in jax.tree_util.tree_leaves(trainer.state.params["encoder"])
        if getattr(l, "ndim", 0) == 4
    ]
    assert any("model" in k.sharding.spec for k in kernels)


def test_dump_reconstruction_scalar_wavevqvae(tmp_path):
    """Regression: scalar-input WaveVQVAE reconstructions are (B, S, 1)
    — ndim 3 like categorical logits — and were misrouted into the
    argmax branch, writing a constant ~-1 waveform artifact. The branch
    must key on the configured output head (is_mulaw_quantize)."""
    import dataclasses
    import types

    from scipy.io import wavfile

    from neural_sound_generation_tpu.cli.main import dump_reconstruction
    from neural_sound_generation_tpu.config import Config

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, audio=dataclasses.replace(cfg.audio, input_type="raw")
    )
    assert not cfg.audio.is_mulaw_quantize
    args = types.SimpleNamespace(
        sampledir=str(tmp_path), dataset="ljspeech", model="wavevqvae",
        dim=8, z_dim=16,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    recon = jnp.asarray(
        (0.5 * rng.standard_normal((2, 512, 1))).astype(np.float32)
    )
    dump_reconstruction(args, cfg, recon, epoch=1)
    wav_path = (
        tmp_path / "ljspeech"
        / "audio_recon_wavevqvae_data_ljspeech_dim_8_z_dim_16_epoch_1.wav"
    )
    sr, wav = wavfile.read(wav_path)
    assert len(wav) == 512
    # a real reconstruction, not the constant the argmax bug produced
    assert np.unique(wav).size > 10
