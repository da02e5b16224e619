"""Wave-domain (raw-waveform VQ-VAE) soak — BASELINE config #3.

The round-4 verdict's last un-soaked BASELINE config: the mu-law
raw-waveform VQ-VAE had only smoke-level evidence. This runs the full
wave-domain story on real hardware, at real model sizes, through the
production CLIs (the multispeaker-soak playbook, round-4):

  Arm A  mu-law float waveform (input_type=mulaw, the reference's
         scalar convention src/hparams.py:19-23): preprocess ->
         WaveVQVAE (dim 256, K=512, 64x downsample) to convergence ->
         held-out waveform reconstruction (mu-law MSE + linear-domain
         SNR) -> codebook health (usage + perplexity) -> audible
         held-out reconstructions.
  Arm A16  the same chain at 16x downsample (--num-downsample 4): the
         unit-rate/fidelity trade-off (64x is the ZeroSpeech-style
         250 Hz unit rate; 16x spends 4x more codes per second on
         waveform detail).
  Arm B  residual VQ (--num-quantizers 2): same data, the SoundStream-
         style refinement — held-out error must beat Arm A's single
         codebook at equal epochs.
  Arm C  the 8-bit mulaw-quantize preset
         (src/presets/cmu_arctic_8bit.json: out_channels 256, CE loss,
         sr 16000): preprocess a CMU-Arctic-layout corpus with the
         preset byte-for-byte -> categorical WaveVQVAE -> held-out CE +
         top-1 code accuracy -> argmax decode -> audible wav.

All arms train with the framework's anti-collapse toolkit on by default
(--ema-codebook + --restart-dead-threshold): the first full run (plain
gradient codebook, the reference's own scheme) collapsed to 8/512 codes
on the wave domain — that control is recorded in PERF.md and
reproducible with --codebook grad.

Prints one JSON line per phase; the final "summary" line is what
PERF.md's "Wave-domain soak" section records. --quick shrinks all arms
for the CPU CI pin (tests/test_cli.py::test_wave_soak_quick).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESET_8BIT = os.path.join(REPO, "neural_sound_generation_tpu", "config",
                           "presets", "cmu_arctic_8bit.json")
SPEAKERS = ["awb", "bdl", "clb", "jmk", "ksp", "rms", "slt"]


def make_lj_corpus(root: str, n: int, seconds: float, sr: int = 22050,
                   seed: int = 0):
    """LJSpeech-layout corpus of structured audio: per-utterance F0
    contour + harmonic stack + amplitude envelope + noise floor — enough
    spectro-temporal structure that reconstruction requires real codes."""
    from neural_sound_generation_tpu.ops import dsp

    rng = np.random.default_rng(seed)
    wav_dir = os.path.join(root, "wavs")
    os.makedirs(wav_dir, exist_ok=True)
    lines = []
    t = np.arange(int(sr * seconds)) / sr
    for i in range(n):
        f0_base = rng.uniform(110.0, 300.0)
        contour = 1.0 + 0.1 * np.sin(
            2 * np.pi * rng.uniform(0.5, 2.5) * t + rng.uniform(0, 6.28)
        )
        phase = 2 * np.pi * np.cumsum(f0_base * contour) / sr
        rolloff = rng.uniform(0.4, 0.75)
        wav = np.zeros_like(t)
        for k in range(1, 9):
            wav += (rolloff ** k) * np.sin(k * phase + rng.uniform(0, 6.28))
        env = 0.25 + 0.75 * np.abs(
            np.sin(2 * np.pi * rng.uniform(0.8, 3.0) * t + rng.uniform(0, 6.28))
        )
        wav = wav * env + 0.004 * rng.standard_normal(len(t))
        wav = (0.6 * wav / np.abs(wav).max()).astype(np.float32)
        dsp.save_wav(wav, os.path.join(wav_dir, f"LJ-{i:04d}.wav"), sr)
        lines.append(f"LJ-{i:04d}|raw {i}|text {i}")
    with open(os.path.join(root, "metadata.csv"), "w", encoding="utf-8") as f:
        f.write("\n".join(lines))


def make_arctic_corpus(root: str, per_speaker: int, seconds: float,
                       sr: int = 16000, seed: int = 1):
    from neural_sound_generation_tpu.ops import dsp

    rng = np.random.default_rng(seed)
    t = np.arange(int(sr * seconds)) / sr
    for sid, spk in enumerate(SPEAKERS):
        wav_dir = os.path.join(root, f"cmu_us_{spk}_arctic", "wav")
        os.makedirs(wav_dir, exist_ok=True)
        f0_base = 100.0 * (1.155 ** sid)
        rolloff = 0.45 + 0.06 * sid
        for i in range(per_speaker):
            contour = 1.0 + 0.08 * np.sin(
                2 * np.pi * rng.uniform(0.5, 2.0) * t + rng.uniform(0, 6.28)
            )
            phase = 2 * np.pi * np.cumsum(f0_base * contour) / sr
            wav = np.zeros_like(t)
            for k in range(1, 9):
                wav += (rolloff ** k) * np.sin(k * phase + rng.uniform(0, 6.28))
            env = 0.3 + 0.7 * np.abs(np.sin(2 * np.pi * rng.uniform(1.0, 3.0) * t))
            wav = wav * env + 0.003 * rng.standard_normal(len(t))
            wav = (0.6 * wav / np.abs(wav).max()).astype(np.float32)
            dsp.save_wav(wav, os.path.join(wav_dir, f"arctic_a{i:04d}.wav"), sr)


def codebook_health(indices: np.ndarray, z_dim: int) -> dict:
    """Usage fraction + perplexity of a code-index sample (the VQ-VAE
    health metrics the 2-D soaks record)."""
    counts = np.bincount(indices.reshape(-1), minlength=z_dim).astype(np.float64)
    p = counts / max(1.0, counts.sum())
    nz = p[p > 0]
    perplexity = float(np.exp(-(nz * np.log(nz)).sum()))
    return {
        "codes_used": int((counts > 0).sum()),
        "z_dim": z_dim,
        "usage_frac": round(float((counts > 0).mean()), 3),
        "perplexity": round(perplexity, 1),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/nsg-wave-soak")
    ap.add_argument("--n-utts", type=int, default=60)
    ap.add_argument("--seconds", type=float, default=2.5)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--z-dim", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--epochs-8bit", type=int, default=20)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--per-speaker", type=int, default=10)
    ap.add_argument("--codebook", choices=["ema", "grad"], default="ema",
                    help="'ema' trains every arm with the full "
                         "anti-collapse toolkit: --ema-codebook + "
                         "dead-code restarts + train-seeded "
                         "--codebook-init data (each measured to help, "
                         "PERF.md); 'grad' reproduces the reference-"
                         "parity control (uniform init, gradient "
                         "codebook — collapses to ~8/512 codes)")
    ap.add_argument("--quick", action="store_true",
                    help="tiny sizes: the CPU CI pin of the CLI sequence")
    args = ap.parse_args(argv)
    if args.quick:
        args.n_utts, args.seconds = 6, 0.6
        args.dim, args.z_dim = 8, 16
        args.epochs = args.epochs_8bit = 1
        args.batch_size = 2
        args.per_speaker = 1

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli import main as train_cli
    from neural_sound_generation_tpu.cli import preprocess as preprocess_cli
    from neural_sound_generation_tpu.config import Config, load_preset
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import WaveVQVAE
    from neural_sound_generation_tpu.ops import dsp
    from neural_sound_generation_tpu.training import (
        checkpoint, create_train_state,
    )

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    def emit(phase, **kw):
        print(json.dumps({"phase": phase, **kw}), flush=True)

    emit("env", backend=jax.default_backend(), device=str(jax.devices()[0]))

    # the mu-law float preset: the reference's input_type=mulaw
    # convention (src/hparams.py:19-23; companding at preprocess time,
    # scalar [-1,1] model input)
    mulaw_preset = os.path.join(wd, "mulaw_preset.json")
    with open(mulaw_preset, "w", encoding="utf-8") as f:
        json.dump({"name": "vocoder", "input_type": "mulaw"}, f)

    # ---------------- Arm A: mu-law raw waveform -----------------
    t0 = time.time()
    lj_in = os.path.join(wd, "lj_in")
    lj_out = os.path.join(wd, "lj_out")
    make_lj_corpus(lj_in, args.n_utts, args.seconds)
    preprocess_cli.main(["ljspeech", lj_in, lj_out, "--preset", mulaw_preset])
    emit("preprocess_mulaw", utterances=args.n_utts,
         secs=round(time.time() - t0, 1))

    # the anti-collapse toolkit (EMA codebook + dead-code restarts):
    # the plain gradient codebook — the reference's scheme — collapses
    # on the wave domain (measured control in PERF.md)
    cb_flags = (
        ["--ema-codebook", "--restart-dead-threshold", "0.03",
         "--codebook-init", "data"]
        if args.codebook == "ema" else []
    )

    def train_wave(ckpt_root, extra):
        train_cli.main([
            "--model", "wavevqvae", "--dataset", "ljspeech",
            "--datadir", lj_out,
            "--sampledir", os.path.join(wd, "results"),
            "--ckpt-dir", ckpt_root, "--preset", mulaw_preset,
            "--batch-size", str(args.batch_size),
            "--epochs", str(args.epochs),
            "--dim", str(args.dim), "--z-dim", str(args.z_dim),
            "--multi-steps", "1" if args.quick else "4",
        ] + cb_flags + extra)
        return os.path.join(
            ckpt_root, "wavevqvae",
            f"checkpoint_ljspeech_{args.dim}_{args.z_dim}",
        )

    t0 = time.time()
    ckpt_a = train_wave(os.path.join(wd, "models_a"), [])
    emit("wavevqvae_train", epochs=args.epochs, secs=round(time.time() - t0, 1))

    cfg = load_preset(mulaw_preset, Config())

    def heldout_eval(ckpt, num_quantizers, tag, num_downsample=6):
        """Held-out mu-law MSE, linear-domain SNR, codebook health; and
        audible artifacts (held-out recon + unit->decode resynthesis)."""
        model = WaveVQVAE(
            dim=args.dim, z_dim=args.z_dim,
            num_downsample=num_downsample,
            input_type=cfg.audio.input_type,
            quantize_channels=cfg.audio.quantize_channels,
            num_quantizers=num_quantizers,
        )
        loaders = get_audio_data_loaders(
            lj_out, None, args.batch_size, cfg, test_shuffle=False,
            batch_mode="wave",
        )
        sample = next(iter(loaders["test"]))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(sample["x"]), train=False
        )
        state = create_train_state(variables, cfg.train)
        state, _ = checkpoint.restore(ckpt, state)
        eval_vars = jax.device_put(
            {"params": state.params, "batch_stats": state.batch_stats}
        )

        @jax.jit
        def fwd(x):
            x_tilde, _, _ = model.apply(eval_vars, x, train=False)
            idx = model.apply(eval_vars, x, train=False,
                              method=WaveVQVAE.encode)
            return x_tilde, idx

        mses, snrs, all_idx = [], [], []
        first = None
        for batch in loaders["test"]:
            x = jnp.asarray(batch["x"])
            x_tilde, idx = fwd(x)
            xt = np.asarray(x_tilde)
            xx = np.asarray(x)
            mses.extend(np.mean((xt - xx) ** 2, axis=(1, 2)).tolist())
            # linear-domain SNR after inverse companding
            lin = np.asarray(dsp.inv_mulaw(
                jnp.asarray(xx[..., 0]), cfg.audio.quantize_channels))
            lin_hat = np.asarray(dsp.inv_mulaw(
                jnp.asarray(xt[..., 0]), cfg.audio.quantize_channels))
            num = np.sum(lin ** 2, axis=1)
            den = np.sum((lin - lin_hat) ** 2, axis=1) + 1e-9
            snrs.extend((10 * np.log10(num / den)).tolist())
            all_idx.append(np.asarray(idx))
            if first is None:
                first = (xx, xt)
        idx_cat = np.concatenate(
            [a.reshape(a.shape[0], -1) if num_quantizers == 1
             else a.reshape(num_quantizers, -1).T for a in all_idx]
        )
        health = (
            codebook_health(idx_cat, args.z_dim)
            if num_quantizers == 1
            else {
                f"stage{q}": codebook_health(idx_cat[:, q], args.z_dim)
                for q in range(num_quantizers)
            }
        )
        # audible artifacts
        out_dir = os.path.join(wd, f"audio_{tag}")
        os.makedirs(out_dir, exist_ok=True)
        xx, xt = first
        for j in range(min(2, xx.shape[0])):
            for name, arr in (("ref", xx[j, :, 0]), ("recon", xt[j, :, 0])):
                wav = np.asarray(dsp.inv_mulaw(
                    jnp.asarray(arr), cfg.audio.quantize_channels))
                dsp.save_wav(wav.astype(np.float32),
                             os.path.join(out_dir, f"{name}_{j}.wav"),
                             cfg.audio.sample_rate)
        return {
            "heldout_mulaw_mse": round(float(np.mean(mses)), 6),
            "heldout_snr_db": round(float(np.mean(snrs)), 2),
            "codebook": health,
            "heldout_utts": len(mses),
        }

    a_stats = heldout_eval(ckpt_a, 1, "mulaw")
    emit("heldout_mulaw", **a_stats)

    # ---------------- Arm A16: 16x downsample -----------------
    # the unit-rate/fidelity trade-off: 4x more codes per second
    t0 = time.time()
    ckpt_a16 = train_wave(
        os.path.join(wd, "models_a16"), ["--num-downsample", "4"]
    )
    emit("wavevqvae16_train", secs=round(time.time() - t0, 1))
    a16_stats = heldout_eval(ckpt_a16, 1, "mulaw_16x", num_downsample=4)
    emit("heldout_mulaw_16x", **a16_stats)

    # ---------------- Arm B: residual VQ -----------------
    t0 = time.time()
    ckpt_b = train_wave(os.path.join(wd, "models_b"), ["--num-quantizers", "2"])
    emit("rvq_train", secs=round(time.time() - t0, 1))
    b_stats = heldout_eval(ckpt_b, 2, "rvq")
    emit("heldout_rvq", **b_stats)

    # ---------------- Arm C: 8-bit mulaw-quantize preset -----------------
    t0 = time.time()
    ar_in = os.path.join(wd, "ar_in")
    ar_out = os.path.join(wd, "ar_out")
    make_arctic_corpus(ar_in, args.per_speaker, args.seconds)
    preprocess_cli.main([
        "cmu_arctic", ar_in, ar_out, "--preset", PRESET_8BIT,
    ])
    emit("preprocess_8bit", utterances=7 * args.per_speaker,
         secs=round(time.time() - t0, 1))

    t0 = time.time()
    train_cli.main([
        "--model", "wavevqvae", "--dataset", "cmu_arctic",
        "--datadir", ar_out,
        "--sampledir", os.path.join(wd, "results_8bit"),
        "--ckpt-dir", os.path.join(wd, "models_c"),
        "--preset", PRESET_8BIT,
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.epochs_8bit),
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--multi-steps", "1" if args.quick else "4",
    ] + cb_flags)
    ckpt_c = os.path.join(
        wd, "models_c", "wavevqvae",
        f"checkpoint_cmu_arctic_{args.dim}_{args.z_dim}",
    )
    emit("train_8bit", epochs=args.epochs_8bit,
         secs=round(time.time() - t0, 1))

    cfg8 = load_preset(PRESET_8BIT, Config())
    model8 = WaveVQVAE(
        dim=args.dim, z_dim=args.z_dim, input_type="mulaw-quantize",
        quantize_channels=cfg8.audio.quantize_channels,
    )
    loaders8 = get_audio_data_loaders(
        ar_out, None, args.batch_size, cfg8, test_shuffle=False,
        batch_mode="wave",
    )
    sample8 = next(iter(loaders8["test"]))
    v8 = model8.init(
        jax.random.PRNGKey(0), jnp.asarray(sample8["x"], jnp.int32),
        train=False,
    )
    st8 = create_train_state(v8, cfg8.train)
    st8, _ = checkpoint.restore(ckpt_c, st8)
    ev8 = jax.device_put(
        {"params": st8.params, "batch_stats": st8.batch_stats}
    )

    @jax.jit
    def fwd8(x):
        logits, _, _ = model8.apply(ev8, x, train=False)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, x[..., None], axis=-1)[..., 0]
        acc = (jnp.argmax(logits, axis=-1) == x).astype(jnp.float32)
        return jnp.mean(ce, axis=1), jnp.mean(acc, axis=1), logits

    ces, accs = [], []
    first8 = None
    for batch in loaders8["test"]:
        x = jnp.asarray(batch["x"], jnp.int32)
        ce, acc, logits = fwd8(x)
        ces.extend(np.asarray(ce).tolist())
        accs.extend(np.asarray(acc).tolist())
        if first8 is None:
            first8 = (np.asarray(x), np.asarray(jnp.argmax(logits, -1)))
    out8 = os.path.join(wd, "audio_8bit")
    os.makedirs(out8, exist_ok=True)
    xq, xhat = first8
    for name, arr in (("ref", xq[0]), ("recon", xhat[0])):
        wav = np.asarray(dsp.inv_mulaw_quantize(
            jnp.asarray(arr), cfg8.audio.quantize_channels))
        dsp.save_wav(wav.astype(np.float32),
                     os.path.join(out8, f"{name}_0.wav"),
                     cfg8.audio.sample_rate)
    c_stats = {
        "heldout_ce_bits": round(float(np.mean(ces)) / np.log(2), 3),
        "heldout_top1_acc": round(float(np.mean(accs)), 3),
        "heldout_utts": len(ces),
    }
    emit("heldout_8bit", **c_stats)

    emit("summary",
         codebook=args.codebook,
         mulaw=a_stats, mulaw_16x=a16_stats, rvq=b_stats,
         mulaw_quantize_8bit=c_stats,
         rvq_beats_single=bool(
             b_stats["heldout_mulaw_mse"] < a_stats["heldout_mulaw_mse"]
         ))


if __name__ == "__main__":
    main()
