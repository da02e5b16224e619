"""Standalone evaluation CLI.

The reference's ``test.py`` (test/test_vae/test_vqvae, src/test.py:11-106)
only runs inside the training loop; this command evaluates a saved
checkpoint against the test split on its own: per-batch metric
accumulation, averaged summary, optional reconstruction artifact dump.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Evaluate a saved checkpoint")
    p.add_argument("--model", default="vqvae",
                   choices=["vae", "vqvae", "wavevqvae", "hiervqvae"])
    p.add_argument("--dataset", default="ljspeech")
    p.add_argument("--datadir", required=True)
    p.add_argument("--ckpt-dir", required=True)
    p.add_argument("--preset", default=None)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--dim", type=int, default=256)
    p.add_argument("--z-dim", type=int, default=512)
    p.add_argument("--norm", choices=["batch", "group"], default="batch")
    p.add_argument("--max-batches", type=int, default=None)
    p.add_argument("--dump-npy", default=None,
                   help="write the last reconstruction batch here")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute for the eval sweep (checkpoints "
                        "are f32 and restore unchanged)")
    p.add_argument("--no-ema", action="store_true",
                   help="evaluate the live training params instead of the "
                        "averaged (EMA) model. Default follows the "
                        "reference's intent (hparams.py:116-118): the EMA "
                        "shadow when the checkpoint carries one.")
    p.add_argument("--num-quantizers", type=int, default=1,
                   help="residual-VQ stages the checkpoint was trained "
                        "with (cli.main --num-quantizers); the template "
                        "codebook must match or restore grafts fresh "
                        "weights")
    p.add_argument("--num-downsample", type=int, default=6,
                   help="wavevqvae stride-2 encoder layers the checkpoint "
                        "was trained with (cli.main --num-downsample)")
    p.add_argument("--mesh-data", type=int, default=None,
                   help="data-parallel shards for the eval sweep (batch "
                        "axis over the mesh's 'data' axis)")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel shards: the restored checkpoint "
                        "is committed to the 'model'-axis layout it "
                        "trained with (codebook rows + conv output "
                        "channels) before the sweep")
    return p.parse_args(argv)


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    from neural_sound_generation_tpu.cli.main import build_config, make_model
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.training import (
        Trainer,
        checkpoint,
        create_train_state,
    )

    args = parse_args(argv)
    args.lr_rate = 1e-3  # unused fields expected by build_config
    args.beta = 1.0
    args.seed = 0
    args.epochs = 1
    args.log_interval = 10
    args.ema_codebook = False
    args.restart_dead_threshold = 0.0
    # validate recorded model metadata BEFORE building the template: a
    # mismatched --num-quantizers/--num-downsample (or wrong --model)
    # would otherwise graft fresh-init weights mid-restore with only a
    # log warning (the vocoder chain got the same guard this round)
    meta = checkpoint.read_extra(args.ckpt_dir) or {}
    if "arch" in meta and meta["arch"] != args.model:
        raise SystemExit(
            f"checkpoint was trained as --model {meta['arch']}, "
            f"not {args.model}"
        )
    for k, flag in (("num_quantizers", args.num_quantizers),
                    ("num_downsample", args.num_downsample)):
        if k in meta and int(meta[k]) != int(flag):
            raise SystemExit(
                f"checkpoint metadata {k}={meta[k]} does not match "
                f"--{k.replace('_', '-')} {flag}"
            )
    cfg = build_config(args)

    loaders = get_audio_data_loaders(
        args.datadir, None, args.batch_size, cfg, test_shuffle=False,
        batch_mode="wave" if args.model == "wavevqvae" else "mel",
        latent_stride=8 if args.model == "hiervqvae" else 4,
    )
    test_loader = loaders["test"]
    sample = next(iter(test_loader))
    n_speakers = cfg.arch.n_speakers if "g" in sample else 0

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = make_model(cfg, n_speakers, norm=args.norm, dtype=dtype)
    init_kwargs = {"g": sample["g"]} if "g" in sample else {}
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(sample["x"]), train=False, **init_kwargs
    )
    # tensor parallelism needs per-leaf optimizer moments in the template
    # (same rule as the train CLIs); the restore adapts either layout
    tensor_parallel = args.mesh_model > 1
    state = create_train_state(
        variables, cfg.train, fused=False if tensor_parallel else None
    )
    state, extra = checkpoint.restore(args.ckpt_dir, state)
    if args.no_ema:
        # drop the EMA shadow so make_eval_step's eval_params resolves to
        # the live params
        state = state.replace(ema_params=None)
    from neural_sound_generation_tpu.parallel import (
        mesh_from_args,
        replicated_sharding,
    )

    mesh, _ = mesh_from_args(args.mesh_data, args.mesh_model, args.batch_size)
    # commit restored numpy leaves to device once, or every eval batch
    # re-uploads the weights through the TPU tunnel. Under a data-only
    # mesh the eval step expects the state replicated (Trainer only
    # re-commits it for tensor_parallel), so commit to that layout here.
    if mesh is None:
        state = jax.device_put(state)
    elif not tensor_parallel:
        state = jax.device_put(state, replicated_sharding(mesh))
    print(f"loaded checkpoint step={int(np.asarray(state.step))} extra={extra}")

    trainer = Trainer(model, cfg, state, mesh=mesh,
                      tensor_parallel=tensor_parallel, log_fn=print)
    batches = iter(test_loader)
    if args.max_batches:
        import itertools

        batches = itertools.islice(batches, args.max_batches)
    means, recon = trainer.eval_epoch(batches)
    print(json.dumps({k: round(v, 6) for k, v in means.items()}))
    if args.dump_npy and recon is not None:
        np.save(args.dump_npy, np.asarray(jax.device_get(recon)))
        print(f"wrote {args.dump_npy}")


if __name__ == "__main__":
    main(sys.argv[1:])
