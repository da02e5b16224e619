"""Label-conditioning probe for the multi-speaker prior.

Measures the trained class(=speaker)-conditioned prior's held-out NLL
on each utterance's TRUE code sequence under (a) the true speaker label
and (b) a wrong label ((g+3) mod 7). If the prior learned the
conditioning, NLL(true) < NLL(wrong) — a direct, sampler-free readout
(F0 analysis of Griffin-Lim decodes is blurred by the vocoder-free
inversion and short training).

Usage: python scripts/ms_prior_label_probe.py <workdir> [prior_dirname]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PRESET = os.path.join(REPO, "neural_sound_generation_tpu", "config",
                      "presets", "multispeaker_cmu_arctic_mixture.json")


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nsg-ms-soak"
    prior_dir = sys.argv[2] if len(sys.argv) > 2 else "prior"
    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli.prior import (
        _build_prior, _load_vqvae, _prior_cfg,
    )
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import checkpoint

    class A:
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
    loaders = get_audio_data_loaders(
        os.path.join(workdir, "out"), None, 8, cfg, test_shuffle=False
    )
    sample = next(iter(loaders["test"]))
    model, vq_vars = _load_vqvae(args, jnp.asarray(sample["x"]), cfg)
    prior = _build_prior(args, spatial_cond=False)
    codes0 = model.apply(
        vq_vars, jnp.asarray(sample["x"]), train=False, method=VQVAE.encode
    )
    template = prior.init(
        jax.random.PRNGKey(0), codes0, jnp.zeros((codes0.shape[0],), jnp.int32)
    )
    pvars, _ = checkpoint.restore(os.path.join(workdir, prior_dir), template)
    pvars = jax.device_put(pvars)

    @jax.jit
    def nll(x, labels):
        codes = model.apply(vq_vars, x, train=False, method=VQVAE.encode)
        logits = prior.apply(pvars, codes, labels)
        logp = jax.nn.log_softmax(logits, axis=-1)
        per = -jnp.take_along_axis(logp, codes[..., None], axis=-1)
        return jnp.mean(per, axis=(1, 2, 3))

    true_all, wrong_all, wins = [], [], 0
    total = 0
    for batch in loaders["test"]:
        x = jnp.asarray(batch["x"])
        g = jnp.asarray(batch["g"], jnp.int32)
        nt = np.asarray(nll(x, g))
        nw = np.asarray(nll(x, (g + 3) % 7))
        true_all.extend(nt.tolist())
        wrong_all.extend(nw.tolist())
        wins += int((nt < nw).sum())
        total += len(nt)
    print(json.dumps({
        "heldout_utts": total,
        "nll_true_label": round(float(np.mean(true_all)), 4),
        "nll_wrong_label": round(float(np.mean(wrong_all)), 4),
        "delta": round(float(np.mean(wrong_all) - np.mean(true_all)), 4),
        "true_label_wins": wins,
    }))


if __name__ == "__main__":
    main()
