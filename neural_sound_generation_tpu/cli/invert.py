"""Mel-inversion CLI.

Reference surface: ``python src/audio_tacotron.py <out_dir> <sample_rate>
<fft_size> <hop_size> <n_mels>`` (audio_tacotron.py:279-312) — loads a
saved time-major mel ``.npy``, inverts it with pinv-mel + Griffin-Lim, and
writes ``recon-...-{sr}-{fft}-{hop}-{mels}.wav``. Same positional surface
here, plus ``--mel-file`` / ``--seed`` options; the Griffin-Lim iteration
runs on device.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import AudioConfig
from neural_sound_generation_tpu.ops import dsp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Invert a saved mel .npy to a wav")
    p.add_argument("out_dir")
    p.add_argument("sample_rate", type=int)
    p.add_argument("fft_size", type=int)
    p.add_argument("hop_size", type=int)
    p.add_argument("n_mels", type=int)
    p.add_argument(
        "--mel-file", default="ljspeech-mel-00001.npy",
        help="mel filename inside out_dir (reference default, "
             "audio_tacotron.py:295)",
    )
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--output", default=None)
    p.add_argument("--gl-iters", type=int, default=60)
    p.add_argument("--gl-momentum", type=float, default=0.0,
                   help="fast Griffin-Lim extrapolation (0.99 typical; "
                        "0 = plain reference algorithm)")
    return p.parse_args(argv)


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    args = parse_args(argv)
    cfg = AudioConfig(
        sample_rate=args.sample_rate,
        fft_size=args.fft_size,
        hop_size=args.hop_size,
        num_mels=args.n_mels,
        fmax=min(7600.0, args.sample_rate / 2),
        griffin_lim_iters=args.gl_iters,
        griffin_lim_momentum=args.gl_momentum,
    )
    mel = np.load(os.path.join(args.out_dir, args.mel_file))
    mel = mel.T  # stored time-major; chain expects (n_mels, frames)
    print(mel.shape)
    assert mel.shape[0] == args.n_mels

    signal = dsp.inv_mel_spectrogram(
        jnp.asarray(mel), cfg, jax.random.PRNGKey(args.seed)
    )
    stem = os.path.splitext(os.path.basename(args.mel_file))[0]
    out = args.output or (
        f"./recon-{stem}-{args.sample_rate}-{args.fft_size}-"
        f"{args.hop_size}-{args.n_mels}.wav"
    )
    dsp.save_wav(np.asarray(signal), out, args.sample_rate)
    print(f"wrote {out}")


if __name__ == "__main__":
    main(sys.argv[1:])
