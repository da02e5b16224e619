"""Held-out per-speaker reconstruction + speaker-swap probe, standalone.

Restores the multi-speaker VQ-VAE checkpoint a soak trained and
measures, on the held-out split, (a) reconstruction MSE per speaker and
(b) the same reconstruction with every utterance decoded under a WRONG
speaker embedding ((g+3) mod 7). Uses the LIVE params — at the
reference EMA decay (0.9999) the shadow barely moves over a short
soak, and probing the stale EMA flattens the swap signal.

Usage: python scripts/ms_swap_probe.py <workdir> [--dim 256 --z-dim 512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESET = os.path.join(REPO, "neural_sound_generation_tpu", "config",
                      "presets", "multispeaker_cmu_arctic_mixture.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workdir")
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--z-dim", type=int, default=512)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.config import Config, load_preset
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import (
        checkpoint, create_train_state,
    )

    cfg = load_preset(PRESET, Config())
    out_dir = os.path.join(args.workdir, "out")
    vq_ckpt = os.path.join(
        args.workdir, "models", "vqvae",
        f"checkpoint_cmu_arctic_{args.dim}_{args.z_dim}",
    )
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
    state, extra = checkpoint.restore(vq_ckpt, state)
    live = jax.device_put(
        {"params": state.params, "batch_stats": state.batch_stats}
    )

    @jax.jit
    def recon_mse(x, g):
        x_tilde, _, _ = model.apply(live, x, train=False, g=g)
        return jnp.mean((x_tilde - x) ** 2, axis=(1, 2, 3))

    per_speaker = {s: [] for s in range(7)}
    true_all, swap_all = [], []
    for batch in loaders["test"]:
        x = jnp.asarray(batch["x"])
        g = jnp.asarray(batch["g"], jnp.int32)
        mt = np.asarray(recon_mse(x, g))
        ms = np.asarray(recon_mse(x, (g + 3) % 7))
        for j, sid in enumerate(np.asarray(g)):
            per_speaker[int(sid)].append(float(mt[j]))
        true_all.extend(mt.tolist())
        swap_all.extend(ms.tolist())
    print(json.dumps({
        "step": int(np.asarray(state.step)),
        "per_speaker_mse": {
            s: round(float(np.mean(v)), 6)
            for s, v in per_speaker.items() if v
        },
        "true_mse": round(float(np.mean(true_all)), 6),
        "swap_mse": round(float(np.mean(swap_all)), 6),
        "swap_over_true": round(
            float(np.mean(swap_all) / np.mean(true_all)), 3
        ),
    }))


if __name__ == "__main__":
    main()
