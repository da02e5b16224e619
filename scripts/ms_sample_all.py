"""Sample all 7 speakers from the multi-speaker prior in ONE process.

Equivalent to seven `cli.prior sample --label k` invocations (same
restore paths, same prior_generate/codes_to_audio chain) but compiles
the generator once — the per-invocation CLI loop pays 7 cold processes,
which a congested tunnel window turns into an hour.

Usage: python scripts/ms_sample_all.py <workdir> [n_per_speaker] [prior_dirname]
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESET = os.path.join(REPO, "neural_sound_generation_tpu", "config",
                      "presets", "multispeaker_cmu_arctic_mixture.json")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nsg-ms-soak"
    n_per = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    prior_dir = sys.argv[3] if len(sys.argv) > 3 else "prior"
    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli.prior import (
        _build_prior, _load_vqvae, _prior_cfg,
    )
    from neural_sound_generation_tpu.inference import (
        codes_to_audio, prior_generate,
    )
    from neural_sound_generation_tpu.ops import dsp
    from neural_sound_generation_tpu.training import checkpoint

    class A:  # the arg surface cli.prior sample parses
        preset = PRESET
        dim, z_dim = 256, 512
        arch, prior_dim, prior_layers = "transformer", 128, 4
        prior_heads = None
        bf16 = False
        moe_experts = 0
        n_classes = 7
        hier = False
        vqvae_ckpt = os.path.join(
            workdir, "models", "vqvae", "checkpoint_cmu_arctic_256_512")

    args = A()
    cfg = _prior_cfg(args)
    h, w = 20, 7
    model, vq_vars = _load_vqvae(args, jnp.zeros((1, h * 4, w * 4, 1)), cfg)
    prior = _build_prior(args, spatial_cond=False)
    template = prior.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    pvars, _ = checkpoint.restore(os.path.join(workdir, prior_dir), template)
    pvars = jax.device_put(pvars)

    # one batch of 7*n_per samples: labels [0]*n + [1]*n + ... — a single
    # generator compile + a single decode
    labels = jnp.asarray(np.repeat(np.arange(7), n_per), jnp.int32)
    key = jax.random.PRNGKey(7)
    codes = prior_generate(
        prior, pvars, labels, key, shape=(h, w), batch_size=len(labels)
    )
    wavs = codes_to_audio(model, vq_vars, codes, cfg.audio, key, g=labels)
    for i, lab in enumerate(np.asarray(labels)):
        out_dir = os.path.join(workdir, f"samples_spk{int(lab)}")
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"prior_sample_{i:03d}.wav")
        dsp.save_wav(np.asarray(wavs[i]), path, cfg.audio.sample_rate)
    print(f"wrote {len(labels)} samples across 7 speakers under {workdir}")


if __name__ == "__main__":
    main()
