"""Multi-speaker (CMU Arctic layout) end-to-end soak — BASELINE config #4.

Runs the FULL speaker-conditioned chain on real hardware, at real model
sizes, through the production CLIs (round-4 verdict item 3: this was the
one BASELINE config with no end-to-end evidence):

  synthetic 7-speaker corpus (per-speaker F0 + spectral tilt)
    -> cli.preprocess cmu_arctic (multispeaker preset: gin_channels=16,
       n_speakers=7, sr 16000 — the reference's
       src/presets/multispeaker_cmu_arctic_mixture.json surface)
    -> speaker-conditioned VQ-VAE (cli.main --preset)
    -> held-out reconstruction per speaker + SPEAKER-SWAP error (decode
       speaker s's codes with speaker s' embedding: the error increase
       is the evidence conditioning matters)
    -> class(=speaker)-conditioned transformer prior (cli.prior)
    -> per-speaker ancestral samples through the conditioned decoder
    -> speaker-conditioned WaveNet vocoder (cli.vocoder) + per-speaker
       synthesis

Prints one JSON line per phase; the final line is the summary recorded
in PERF.md. Sized for ~10-15 min on one v5e chip; --quick shrinks
everything for a CPU smoke.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SR = 16000
SPEAKERS = ["awb", "bdl", "clb", "jmk", "ksp", "rms", "slt"]
PRESET = os.path.join(REPO, "neural_sound_generation_tpu", "config",
                      "presets", "multispeaker_cmu_arctic_mixture.json")


def make_corpus(root: str, per_speaker: int, seconds: float, seed: int = 0):
    """Per-speaker timbre: fundamental rises 100->270 Hz across speakers
    and the harmonic rolloff steepens, so speaker identity is carried by
    the spectral envelope — exactly what the gin embedding must learn."""
    from neural_sound_generation_tpu.ops import dsp

    rng = np.random.default_rng(seed)
    t = np.arange(int(SR * seconds)) / SR
    for sid, spk in enumerate(SPEAKERS):
        wav_dir = os.path.join(root, f"cmu_us_{spk}_arctic", "wav")
        os.makedirs(wav_dir, exist_ok=True)
        f0_base = 100.0 * (1.155 ** sid)          # 100 .. 235 Hz
        rolloff = 0.45 + 0.06 * sid               # harmonic decay
        for i in range(per_speaker):
            # per-utterance prosody: slow random pitch contour + envelope
            contour = 1.0 + 0.08 * np.sin(
                2 * np.pi * rng.uniform(0.5, 2.0) * t + rng.uniform(0, 6.28)
            )
            f0 = f0_base * contour
            phase = 2 * np.pi * np.cumsum(f0) / SR
            wav = np.zeros_like(t)
            for k in range(1, 9):
                wav += (rolloff ** k) * np.sin(k * phase + rng.uniform(0, 6.28))
            env = 0.3 + 0.7 * np.abs(
                np.sin(2 * np.pi * rng.uniform(1.0, 3.0) * t)
            )
            wav = wav * env
            wav += 0.003 * rng.standard_normal(len(t))
            wav = 0.6 * wav / np.abs(wav).max()
            dsp.save_wav(
                wav.astype(np.float32),
                os.path.join(wav_dir, f"arctic_a{i:04d}.wav"), SR,
            )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/nsg-ms-soak")
    ap.add_argument("--per-speaker", type=int, default=24)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--z-dim", type=int, default=512)
    ap.add_argument("--vq-epochs", type=int, default=12)
    ap.add_argument("--prior-epochs", type=int, default=4)
    ap.add_argument("--wn-epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes for a CPU smoke of the script itself")
    args = ap.parse_args()
    if args.quick:
        args.per_speaker, args.seconds = 3, 0.6
        args.dim, args.z_dim = 8, 16
        args.vq_epochs = args.prior_epochs = args.wn_epochs = 1
        args.batch_size = 2

    import jax
    import jax.numpy as jnp

    wd = args.workdir
    in_dir, out_dir = os.path.join(wd, "in"), os.path.join(wd, "out")
    results = os.path.join(wd, "results")
    models = os.path.join(wd, "models")
    os.makedirs(wd, exist_ok=True)

    def emit(phase, **kw):
        print(json.dumps({"phase": phase, **kw}), flush=True)

    emit("env", backend=jax.default_backend(),
         device=str(jax.devices()[0]))

    # 1. corpus + preprocess through the product CLI
    t0 = time.time()
    make_corpus(in_dir, args.per_speaker, args.seconds)
    from neural_sound_generation_tpu.cli import preprocess as preprocess_cli

    preprocess_cli.main(["cmu_arctic", in_dir, out_dir, "--preset", PRESET])
    emit("preprocess", utterances=7 * args.per_speaker,
         secs=round(time.time() - t0, 1))

    # 2. speaker-conditioned VQ-VAE through the train CLI
    t0 = time.time()
    from neural_sound_generation_tpu.cli import main as train_cli

    train_cli.main([
        "--model", "vqvae", "--dataset", "cmu_arctic",
        "--datadir", out_dir, "--sampledir", results,
        "--ckpt-dir", models, "--preset", PRESET,
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.vq_epochs),
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--multi-steps", "4",
    ])
    vq_ckpt = os.path.join(
        models, "vqvae", f"checkpoint_cmu_arctic_{args.dim}_{args.z_dim}"
    )
    emit("vqvae_train", epochs=args.vq_epochs,
         secs=round(time.time() - t0, 1))

    # 3. held-out per-speaker reconstruction + speaker-swap evidence
    from neural_sound_generation_tpu.config import Config, load_preset
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import (
        checkpoint, create_train_state,
    )

    cfg = load_preset(PRESET, Config())
    loaders = get_audio_data_loaders(
        out_dir, None, args.batch_size, cfg, test_shuffle=False
    )
    sample = next(iter(loaders["test"]))
    model = VQVAE(
        input_dim=1, dim=args.dim, z_dim=args.z_dim,
        n_speakers=cfg.arch.n_speakers, gin_channels=cfg.arch.gin_channels,
    )
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["x"]), train=False,
        g=jnp.asarray(sample["g"], jnp.int32),
    )
    state = create_train_state(variables, cfg.train)
    state, _ = checkpoint.restore(vq_ckpt, state)
    # probe the LIVE params: at the reference EMA decay (0.9999,
    # hparams.py:118) the shadow is still ~at init after a short soak's
    # few hundred steps, and an EMA-stale decoder would flatten the
    # speaker-swap signal (measured: ratio 1.009 via EMA vs live)
    eval_vars = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    @jax.jit
    def recon_mse(x, g):
        x_tilde, _, _ = model.apply(eval_vars, x, train=False, g=g)
        return jnp.mean((x_tilde - x) ** 2, axis=(1, 2, 3))

    per_speaker = {s: [] for s in range(7)}
    swap_true, swap_swapped = [], []
    for batch in loaders["test"]:
        x = jnp.asarray(batch["x"])
        g = jnp.asarray(batch["g"], jnp.int32)
        mse_true = np.asarray(recon_mse(x, g))
        mse_swap = np.asarray(recon_mse(x, (g + 3) % 7))
        for j, sid in enumerate(np.asarray(g)):
            per_speaker[int(sid)].append(float(mse_true[j]))
        swap_true.extend(mse_true.tolist())
        swap_swapped.extend(mse_swap.tolist())
    per_speaker_mean = {
        s: round(float(np.mean(v)), 6) for s, v in per_speaker.items() if v
    }
    ratio = float(np.mean(swap_swapped) / np.mean(swap_true))
    emit("heldout_recon", per_speaker_mse=per_speaker_mean,
         swap_mse=round(float(np.mean(swap_swapped)), 6),
         true_mse=round(float(np.mean(swap_true)), 6),
         swap_over_true=round(ratio, 3))

    # 4. speaker(=class)-conditioned prior + per-speaker samples through
    # the conditioned decoder
    t0 = time.time()
    from neural_sound_generation_tpu.cli import prior as prior_cli

    prior_ckpt = os.path.join(wd, "prior")
    pd = "16" if args.quick else "128"
    pl = "2" if args.quick else "4"
    prior_cli.main([
        "train", "--datadir", out_dir, "--vqvae-ckpt", vq_ckpt,
        "--ckpt-dir", prior_ckpt, "--preset", PRESET,
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--arch", "transformer", "--prior-dim", pd, "--prior-layers", pl,
        "--n-classes", "7", "--batch-size", str(args.batch_size),
        "--epochs", str(args.prior_epochs), "--bf16",
    ])
    emit("prior_train", secs=round(time.time() - t0, 1))

    t0 = time.time()
    sample_grid = ["--code-shape", "20", "7"]
    for spk in range(7):
        prior_cli.main([
            "sample", "--vqvae-ckpt", vq_ckpt, "--prior-ckpt", prior_ckpt,
            "--output-dir", os.path.join(wd, f"samples_spk{spk}"),
            "--preset", PRESET,
            "--dim", str(args.dim), "--z-dim", str(args.z_dim),
            "--arch", "transformer", "--prior-dim", pd,
            "--prior-layers", pl,
            "--n-classes", "7", "--num-samples", "2", "--label", str(spk),
        ] + sample_grid)
    n_wavs = sum(
        len(os.listdir(os.path.join(wd, f"samples_spk{s}")))
        for s in range(7)
    )
    emit("prior_samples", wavs=n_wavs, secs=round(time.time() - t0, 1))

    # 5. speaker-conditioned WaveNet + per-speaker synthesis
    t0 = time.time()
    from neural_sound_generation_tpu.cli import vocoder as vocoder_cli

    wn_ckpt = os.path.join(wd, "wavenet")
    vocoder_cli.main([
        "train", "--datadir", out_dir, "--ckpt-dir", wn_ckpt,
        "--preset", PRESET, "--batch-size", "2",
        "--epochs", str(args.wn_epochs),
        "--layers", "4" if args.quick else "12",
        "--stacks", "2" if args.quick else "2",
        "--residual-channels", "8" if args.quick else "64",
    ])
    emit("wavenet_train", secs=round(time.time() - t0, 1))

    t0 = time.time()
    import glob as _glob

    mel = sorted(_glob.glob(os.path.join(out_dir, "*-mel-*.npy")))[0]
    for spk in (0, 6):
        vocoder_cli.main([
            "synthesize", "--ckpt-dir", wn_ckpt, "--mel-npy", mel,
            "--output", os.path.join(wd, f"wn_spk{spk}.wav"),
            "--preset", PRESET,
            "--layers", "4" if args.quick else "12",
            "--stacks", "2", "--residual-channels",
            "8" if args.quick else "64",
            "--max-frames", "8" if args.quick else "40",
            "--speaker-id", str(spk),
        ])
    emit("wavenet_synth", secs=round(time.time() - t0, 1))

    emit("summary", per_speaker_mse=per_speaker_mean,
         swap_over_true=round(ratio, 3),
         conditioning_matters=bool(ratio > 1.2),
         prior_sample_wavs=n_wavs)


if __name__ == "__main__":
    main()
