"""PixelCNN prior training + sampling CLI.

The reference ships the GatedPixelCNN prior (models.py:285-341) but no
training loop or sampling entry point for it (generate even crashes,
SURVEY §8). This CLI completes the pipeline: ``train`` extracts code
grids from a trained VQ-VAE over a preprocessed corpus and fits the
class-conditioned prior with cross-entropy; ``sample`` runs ancestral
sampling and decodes the grids to audio.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

import jax
import jax.numpy as jnp
import optax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/sample the PixelCNN prior")
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train")
    tr.add_argument("--datadir", required=True, help="preprocessed corpus dir")
    tr.add_argument("--vqvae-ckpt", required=True)
    tr.add_argument("--ckpt-dir", default="./models/prior")
    tr.add_argument("--dim", type=int, default=256, help="vqvae hidden width")
    tr.add_argument("--z-dim", type=int, default=512, help="codebook size")
    tr.add_argument("--prior-dim", type=int, default=64)
    tr.add_argument("--prior-layers", type=int, default=15)
    tr.add_argument("--n-classes", type=int, default=10)
    tr.add_argument("--batch-size", type=int, default=32)
    tr.add_argument("--epochs", type=int, default=10)
    tr.add_argument("--lr", type=float, default=3e-4)
    tr.add_argument("--max-batches-per-epoch", type=int, default=None)
    tr.add_argument("--seed", type=int, default=0)

    sa = sub.add_parser("sample")
    sa.add_argument("--vqvae-ckpt", required=True)
    sa.add_argument("--prior-ckpt", required=True)
    sa.add_argument("--output-dir", default="./results/prior")
    sa.add_argument("--dim", type=int, default=256)
    sa.add_argument("--z-dim", type=int, default=512)
    sa.add_argument("--prior-dim", type=int, default=64)
    sa.add_argument("--prior-layers", type=int, default=15)
    sa.add_argument("--n-classes", type=int, default=10)
    sa.add_argument("--code-shape", type=int, nargs=2, default=[20, 28])
    sa.add_argument("--num-samples", type=int, default=4)
    sa.add_argument("--label", type=int, default=0)
    sa.add_argument("--seed", type=int, default=0)
    return p.parse_args(argv)


def _load_vqvae(args, sample_x):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    model = VQVAE(input_dim=1, dim=args.dim, z_dim=args.z_dim)
    variables = model.init(jax.random.PRNGKey(0), sample_x, train=False)
    state = create_train_state(variables, Config().train)
    restored, _ = checkpoint.restore(args.vqvae_ckpt, state)
    return model, {
        "params": restored.params,
        "batch_stats": restored.batch_stats,
    }


def cmd_train(args):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import VQVAE, GatedPixelCNN
    from neural_sound_generation_tpu.training import checkpoint

    cfg = Config()
    loaders = get_audio_data_loaders(args.datadir, None, args.batch_size, cfg)
    sample = next(iter(loaders["train"]))
    model, vq_vars = _load_vqvae(args, jnp.asarray(sample["x"]))

    @jax.jit
    def encode(x):
        return model.apply(vq_vars, x, train=False, method=VQVAE.encode)

    prior = GatedPixelCNN(
        input_dim=args.z_dim,
        dim=args.prior_dim,
        n_layers=args.prior_layers,
        n_classes=args.n_classes,
    )
    codes0 = encode(jnp.asarray(sample["x"]))
    labels0 = jnp.asarray(
        sample.get("g", np.zeros(codes0.shape[0], np.int32)), jnp.int32
    )
    pvars = prior.init(jax.random.PRNGKey(args.seed), codes0, labels0)
    tx = optax.adam(args.lr)
    opt_state = tx.init(pvars)

    @jax.jit
    def train_step(pvars, opt_state, codes, labels):
        def loss_fn(pv):
            logits = prior.apply(pv, codes, labels)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)
            return jnp.mean(nll)

        loss, grads = jax.value_and_grad(loss_fn)(pvars)
        updates, opt_state = tx.update(grads, opt_state, pvars)
        return optax.apply_updates(pvars, updates), opt_state, loss

    step = 0
    for epoch in range(1, args.epochs + 1):
        losses = []
        for i, batch in enumerate(loaders["train"]):
            if args.max_batches_per_epoch and i >= args.max_batches_per_epoch:
                break
            codes = encode(jnp.asarray(batch["x"]))
            labels = jnp.asarray(
                batch.get("g", np.zeros(codes.shape[0], np.int32)), jnp.int32
            )
            pvars, opt_state, loss = train_step(pvars, opt_state, codes, labels)
            losses.append(float(loss))
            step += 1
        print(f"prior epoch {epoch}: nll/code {np.mean(losses):.4f} "
              f"(ppl {np.exp(np.mean(losses)):.1f} of {args.z_dim})")
        checkpoint.save(args.ckpt_dir, pvars, step=step, extra={"epoch": epoch})
    print(f"prior saved to {args.ckpt_dir}")


def cmd_sample(args):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.inference import codes_to_audio
    from neural_sound_generation_tpu.models import GatedPixelCNN
    from neural_sound_generation_tpu.models.pixelcnn import fast_generate
    from neural_sound_generation_tpu.ops import dsp
    from neural_sound_generation_tpu.training import checkpoint

    cfg = Config()
    h, w = args.code_shape
    sample_x = jnp.zeros((1, h * 4, w * 4, 1))
    model, vq_vars = _load_vqvae(args, sample_x)

    prior = GatedPixelCNN(
        input_dim=args.z_dim,
        dim=args.prior_dim,
        n_layers=args.prior_layers,
        n_classes=args.n_classes,
    )
    codes0 = jnp.zeros((1, h, w), jnp.int32)
    template = prior.init(jax.random.PRNGKey(0), codes0, jnp.zeros((1,), jnp.int32))
    pvars, _ = checkpoint.restore(args.prior_ckpt, template)

    labels = jnp.full((args.num_samples,), args.label, jnp.int32)
    key = jax.random.PRNGKey(args.seed)
    codes = fast_generate(
        prior, pvars, labels, key, shape=(h, w), batch_size=args.num_samples
    )
    wavs = codes_to_audio(model, vq_vars, codes, cfg.audio, key)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.num_samples):
        path = os.path.join(args.output_dir, f"prior_sample_{i:03d}.wav")
        dsp.save_wav(np.asarray(wavs[i]), path, cfg.audio.sample_rate)
    print(f"wrote {args.num_samples} samples to {args.output_dir}")


def main(argv=None):
    args = parse_args(argv)
    {"train": cmd_train, "sample": cmd_sample}[args.cmd](args)


if __name__ == "__main__":
    main(sys.argv[1:])
