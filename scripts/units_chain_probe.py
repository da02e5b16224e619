"""Units -> WaveNet decode-chain probe: the wave soak's follow-up.

The round-5 wave soak measured the raw-waveform family's strided-conv
decoder at its conditional-mean ceiling (8-bit arm: held-out CE 8.12
bits/sample — WORSE than the 7.45-bit marginal). This probe trains the
framework's fix — `cli.vocoder train --condition units`: the same
frozen WaveVQVAE's quantized latents conditioning the AUTOREGRESSIVE
WaveNet — on the same corpus/units, and reports the same held-out
teacher-forced CE bits/sample, apples to apples.

Usage: python scripts/units_chain_probe.py [--workdir /tmp/nsg-wave-soak2]
(expects the wave soak's ar_out corpus + models_c units checkpoint).
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

PRESET_8BIT = os.path.join(REPO, "neural_sound_generation_tpu", "config",
                           "presets", "cmu_arctic_8bit.json")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/nsg-wave-soak2")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--z-dim", type=int, default=512)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--layers", type=int, default=12)
    ap.add_argument("--stacks", type=int, default=2)
    ap.add_argument("--residual", type=int, default=64)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli import vocoder as vocoder_cli
    from neural_sound_generation_tpu.cli.vocoder import (
        _build_units_encoder, build_model,
    )
    from neural_sound_generation_tpu.config import Config, load_preset
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import WaveNet
    from neural_sound_generation_tpu.training import checkpoint

    wd = args.workdir
    units_ckpt = os.path.join(
        wd, "models_c", "wavevqvae",
        f"checkpoint_cmu_arctic_{args.dim}_{args.z_dim}",
    )
    assert os.path.isdir(units_ckpt), f"run wave_soak first: {units_ckpt}"

    def emit(phase, **kw):
        print(json.dumps({"phase": phase, **kw}), flush=True)

    emit("env", backend=jax.default_backend())

    units = [
        "--condition", "units", "--units-vqvae-ckpt", units_ckpt,
        "--units-dim", str(args.dim), "--units-z-dim", str(args.z_dim),
        "--units-downsample", "6",
    ]
    wn_ckpt = os.path.join(wd, "wn_units")
    t0 = time.time()
    vocoder_cli.main([
        "train", "--datadir", os.path.join(wd, "ar_out"),
        "--ckpt-dir", wn_ckpt, "--preset", PRESET_8BIT,
        "--batch-size", "2", "--epochs", str(args.epochs),
        "--layers", str(args.layers), "--stacks", str(args.stacks),
        "--residual-channels", str(args.residual),
    ] + units)
    emit("units_wavenet_train", epochs=args.epochs,
         secs=round(time.time() - t0, 1))

    # held-out teacher-forced CE bits/sample — same metric, same split
    # as the wave soak's 8-bit conv-decoder arm
    cfg = load_preset(PRESET_8BIT, Config())

    class A:  # the build_model arg surface
        condition = "units"
        units_dim = args.dim
        units_z_dim = args.z_dim
        units_downsample = 6
        units_num_quantizers = 1
        units_vqvae_ckpt = units_ckpt
        layers = args.layers
        stacks = args.stacks
        residual_channels = args.residual
        bf16 = False

    model = build_model(cfg, A)
    units_fn, units_model = _build_units_encoder(A, cfg)
    uhop = units_model.hop

    loaders = get_audio_data_loaders(
        os.path.join(wd, "ar_out"), None, 2, cfg, test_shuffle=False,
        batch_mode="raw",
    )
    sample = next(iter(loaders["test"]))
    y0 = jnp.asarray(sample["y"], jnp.int32)
    y0 = y0[:, : y0.shape[1] - y0.shape[1] % uhop]
    template = model.init(
        jax.random.PRNGKey(0), WaveNet.shift_inputs(y0, False),
        units_fn(y0),
    )
    variables, _ = checkpoint.restore(wn_ckpt, template)
    variables = jax.device_put(variables)

    @jax.jit
    def ce_bits(y):
        c = units_fn(y)
        logits = model.apply(variables, WaveNet.shift_inputs(y, False), c)
        logp = jax.nn.log_softmax(logits, axis=-1)
        ce = -jnp.take_along_axis(logp, y[..., None], axis=-1)[..., 0]
        acc = (jnp.argmax(logits, axis=-1) == y).astype(jnp.float32)
        return jnp.mean(ce, axis=1) / jnp.log(2.0), jnp.mean(acc, axis=1)

    ces, accs = [], []
    for batch in loaders["test"]:
        y = jnp.asarray(batch["y"], jnp.int32)
        y = y[:, : y.shape[1] - y.shape[1] % uhop]
        ce, acc = ce_bits(y)
        ces.extend(np.asarray(ce).tolist())
        accs.extend(np.asarray(acc).tolist())
    emit("heldout_units_wavenet",
         ce_bits=round(float(np.mean(ces)), 3),
         top1_acc=round(float(np.mean(accs)), 3),
         heldout_utts=len(ces),
         conv_decoder_ce_bits=8.12,     # the soak's 8-bit arm
         marginal_entropy_bits=7.45)    # the soak's measured marginal

    # audible resynthesis through the product CLI: wav -> units -> WaveNet
    src = None
    for root, _, files in os.walk(os.path.join(wd, "ar_in")):
        wavs = [f for f in files if f.endswith(".wav")]
        if wavs:
            src = os.path.join(root, sorted(wavs)[0])
            break
    assert src is not None, (
        f"no source wav under {os.path.join(wd, 'ar_in')} — re-run "
        f"wave_soak (or point --workdir at its workdir)"
    )
    t0 = time.time()
    out_wav = os.path.join(wd, "units_resynth.wav")
    vocoder_cli.main([
        "synthesize", "--ckpt-dir", wn_ckpt, "--wav-in", src,
        "--output", out_wav, "--preset", PRESET_8BIT,
        "--layers", str(args.layers), "--stacks", str(args.stacks),
        "--residual-channels", str(args.residual),
        "--max-frames", "60",
    ] + units)
    emit("resynthesis", wav=out_wav, secs=round(time.time() - t0, 1))
    emit("summary", ce_bits=round(float(np.mean(ces)), 3),
         beats_conv_decoder=bool(np.mean(ces) < 8.12),
         beats_marginal=bool(np.mean(ces) < 7.45))


if __name__ == "__main__":
    main()
