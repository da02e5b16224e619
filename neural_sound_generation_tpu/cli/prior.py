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


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train/sample the PixelCNN prior")
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train")
    tr.add_argument("--datadir", required=True, help="preprocessed corpus dir")
    tr.add_argument("--vqvae-ckpt", required=True)
    tr.add_argument("--ckpt-dir", default="./models/prior")
    tr.add_argument("--preset", default=None,
                    help="hparams preset JSON (e.g. the reference's "
                         "multispeaker_cmu_arctic_mixture.json): sets the "
                         "audio chain AND, when gin_channels > 0, loads "
                         "the VQ-VAE template speaker-conditioned so the "
                         "checkpoint's speaker embeddings restore")
    tr.add_argument("--dim", type=int, default=256, help="vqvae hidden width")
    tr.add_argument("--z-dim", type=int, default=512, help="codebook size")
    tr.add_argument("--arch", choices=["pixelcnn", "transformer"],
                    default="pixelcnn",
                    help="prior family: the reference's GatedPixelCNN, or "
                         "the causal-attention TransformerPrior (MXU-"
                         "shaped training, KV-cached sampling)")
    tr.add_argument("--prior-dim", type=int, default=64)
    tr.add_argument("--prior-layers", type=int, default=15)
    tr.add_argument("--prior-heads", type=int, default=None,
                    help="attention heads (transformer arch only); "
                         "default sizes heads to 64 channels each — "
                         "narrower heads under-fill the 128-wide MXU "
                         "(measured sweep in PERF.md)")
    tr.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute (params stay f32); measured "
                         "+27%% transformer / +10%% pixelcnn steps/s "
                         "(PERF.md)")
    tr.add_argument("--moe-experts", type=int, default=0,
                    help="transformer arch only: switch-MoE feed-forwards "
                         "with this many experts (0 = dense); expert "
                         "weights shard over --mesh-model (expert "
                         "parallelism)")
    tr.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in "
                         "--ckpt-dir: params, Adam moments, EMA, step "
                         "numbering, epoch count, and the epoch's "
                         "shuffle order all resume via the *_train "
                         "sibling (older artifact-only checkpoints "
                         "resume params + EMA; moments restart)")
    tr.add_argument("--n-classes", type=int, default=10)
    tr.add_argument("--batch-size", type=int, default=32)
    tr.add_argument("--epochs", type=int, default=10)
    tr.add_argument("--lr", type=float, default=3e-4)
    tr.add_argument("--max-batches-per-epoch", type=int, default=None)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--mesh-data", type=int, default=None)
    tr.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel shards for the prior (layer "
                         "kernels + embeddings over the 'model' axis)")
    tr.add_argument("--mesh-pipe", type=int, default=1,
                    help="GPipe pipeline-parallel stages for the "
                         "transformer prior's block stack: layer weights "
                         "AND Adam moments live sharded over the 'pipe' "
                         "axis (each device holds n_layers/N layers); "
                         "composes with --mesh-data as DPxPP; "
                         "checkpoints export dense so a pp-N run "
                         "resumes at any other width and `sample` "
                         "restores the artifact directly; the EMA "
                         "shadow rides the same stage-sharded layout "
                         "and exports the *_ema sibling")
    tr.add_argument("--pp-microbatches", type=int, default=None,
                    help="GPipe microbatches per step (default: "
                         "--mesh-pipe); must divide --batch-size; "
                         "bubble fraction is (N-1)/(M+N-1)")
    tr.add_argument("--multi-steps", type=int, default=1,
                    help="optimization steps per device launch (lax.scan)")
    tr.add_argument("--ema-warmup", action="store_true",
                    help="ramp the EMA decay min(decay, (1+t)/(10+t)) so "
                         "short runs export a non-stale *_ema artifact "
                         "(fixed reference decay otherwise)")
    tr.add_argument("--hier", action="store_true",
                    help="VQ-VAE checkpoint is a two-level hiervqvae")
    tr.add_argument("--hier-level", choices=["top", "bottom"], default="top",
                    help="which level's prior to train (bottom is "
                         "spatially conditioned on the top codes)")

    sa = sub.add_parser("sample")
    sa.add_argument("--vqvae-ckpt", required=True)
    sa.add_argument("--prior-ckpt", required=True)
    sa.add_argument("--output-dir", default="./results/prior")
    sa.add_argument("--preset", default=None,
                    help="hparams preset JSON; with gin_channels > 0 the "
                         "decoder is speaker-conditioned and --label "
                         "selects the speaker the samples are decoded as")
    sa.add_argument("--dim", type=int, default=256)
    sa.add_argument("--z-dim", type=int, default=512)
    sa.add_argument("--arch", choices=["pixelcnn", "transformer"],
                    default="pixelcnn")
    sa.add_argument("--prior-dim", type=int, default=64)
    sa.add_argument("--prior-layers", type=int, default=15)
    sa.add_argument("--prior-heads", type=int, default=None)
    sa.add_argument("--bf16", action="store_true")
    sa.add_argument("--moe-experts", type=int, default=0)
    sa.add_argument("--n-classes", type=int, default=10)
    sa.add_argument("--code-shape", type=int, nargs=2, default=[20, 28])
    sa.add_argument("--num-samples", type=int, default=4)
    sa.add_argument("--label", type=int, default=0)
    sa.add_argument("--seed", type=int, default=0)
    sa.add_argument("--hier", action="store_true",
                    help="sample the two-level chain; --prior-ckpt is the "
                         "top prior, --bottom-ckpt the conditional bottom")
    sa.add_argument("--bottom-ckpt", default=None)
    # the two levels are routinely DIFFERENT architectures (transformer
    # on the short top grid, pixelcnn past the long-T cliff — the
    # measured steer in long_t_warning): without per-level overrides a
    # mixed chain restored fresh-init weights into whichever level's
    # template didn't match (round-5 review finding)
    sa.add_argument("--bottom-arch", choices=["pixelcnn", "transformer"],
                    default=None,
                    help="bottom prior family when it differs from "
                         "--arch (default: same as --arch)")
    sa.add_argument("--bottom-dim", type=int, default=None,
                    help="bottom prior width (default: --prior-dim)")
    sa.add_argument("--bottom-layers", type=int, default=None,
                    help="bottom prior depth (default: --prior-layers)")
    sa.add_argument("--bottom-heads", type=int, default=None,
                    help="bottom attention heads (default: --prior-heads)")
    return p.parse_args(argv)


def _bottom_args(args):
    """The sample-time bottom prior's build args: --bottom-* overrides
    falling back to the top-level --arch/--prior-* flags."""
    import copy

    b = copy.copy(args)
    if getattr(args, "bottom_arch", None):
        b.arch = args.bottom_arch
    if getattr(args, "bottom_dim", None):
        b.prior_dim = args.bottom_dim
    if getattr(args, "bottom_layers", None):
        b.prior_layers = args.bottom_layers
    if getattr(args, "bottom_heads", None):
        b.prior_heads = args.bottom_heads
    return b


def _build_prior(args, spatial_cond: bool):
    """Prior module from the CLI surface: the reference's GatedPixelCNN
    (src/models.py:285-341) or the TPU-first TransformerPrior."""
    from neural_sound_generation_tpu.models import (
        GatedPixelCNN, TransformerPrior,
    )

    dtype = (
        jnp.bfloat16 if getattr(args, "bf16", False) else jnp.float32
    )
    if getattr(args, "arch", "pixelcnn") == "transformer":
        heads = args.prior_heads or max(1, args.prior_dim // 64)
        return TransformerPrior(
            input_dim=args.z_dim,
            dim=args.prior_dim,
            n_layers=args.prior_layers,
            n_heads=heads,
            n_classes=args.n_classes,
            n_experts=getattr(args, "moe_experts", 0),
            spatial_cond=spatial_cond,
            dtype=dtype,
        )
    return GatedPixelCNN(
        input_dim=args.z_dim,
        dim=args.prior_dim,
        n_layers=args.prior_layers,
        n_classes=args.n_classes,
        spatial_cond=spatial_cond,
        dtype=dtype,
    )


def long_t_warning(arch: str, codes_shape, threshold: int = 1024):
    """Measured cliff (PERF.md "long-T regime"): at the hier bottom grid
    (T=2240, hd=64) the fused attention kernel's Q tiles starve the MXU
    and even stock XLA runs ~102 ms fwd+bwd (~10 steps/s) — an order of
    magnitude slower than the PixelCNN prior at the same grid. Returns a
    loud steer (or None) instead of blocking: long-T transformer priors
    still work, they are just the wrong default at bottom-level grids."""
    h, w = int(codes_shape[1]), int(codes_shape[2])
    if arch != "transformer" or h * w < threshold:
        return None
    return (
        f"WARNING: transformer prior over a {h}x{w} code grid "
        f"(T={h * w}): causal attention at this length runs ~10 steps/s "
        f"on v5e (PERF.md 'long-T regime'); --arch pixelcnn is ~an "
        f"order of magnitude faster at bottom-level grids"
    )


def _prior_cfg(args):
    """Config with the optional --preset overlay (the multispeaker
    cmu_arctic preset is how speaker conditioning reaches this CLI)."""
    from neural_sound_generation_tpu.config import Config, load_preset

    cfg = Config()
    if getattr(args, "preset", None):
        cfg = load_preset(args.preset, cfg)
    return cfg


def _load_vqvae(args, sample_x, cfg=None):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE, HierVQVAE
    from neural_sound_generation_tpu.training import checkpoint, create_train_state

    cfg = cfg or Config()
    gin = cfg.arch.gin_channels
    n_speakers = cfg.arch.n_speakers if gin > 0 else 0
    init_kwargs = {}
    if getattr(args, "hier", False):
        model = HierVQVAE(input_dim=1, dim=args.dim, z_dim=args.z_dim)
    else:
        # speaker-conditioned decoder when the preset says so (the
        # multispeaker_cmu_arctic configuration, src/hparams.py:80-84) —
        # the template must carry the embedding or restore drops it
        model = VQVAE(
            input_dim=1, dim=args.dim, z_dim=args.z_dim,
            n_speakers=n_speakers, gin_channels=gin if n_speakers else -1,
        )
        if n_speakers:
            init_kwargs["g"] = jnp.zeros((sample_x.shape[0],), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), sample_x, train=False, **init_kwargs
    )
    state = create_train_state(variables, cfg.train)
    restored, _ = checkpoint.restore(args.vqvae_ckpt, state)
    # commit to device once: uncommitted numpy leaves re-upload through
    # the TPU tunnel on every jit call (see cli/serve.py build_service)
    return model, jax.device_put({
        "params": restored.params,
        "batch_stats": restored.batch_stats,
    })


def cmd_train(args):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import checkpoint

    cfg = _prior_cfg(args)
    hier = getattr(args, "hier", False)
    bottom_level = hier and args.hier_level == "bottom"
    loaders = get_audio_data_loaders(
        args.datadir, None, args.batch_size, cfg,
        latent_stride=8 if hier else 4,
    )
    sample = next(iter(loaders["train"]))
    model, vq_vars = _load_vqvae(args, jnp.asarray(sample["x"]), cfg)

    if hier:
        from neural_sound_generation_tpu.inference import hier_cond_map
        from neural_sound_generation_tpu.models import HierVQVAE

        @jax.jit
        def encode(x):
            """(codes, cond_map|None) for the configured level."""
            idx_t, idx_b = model.apply(
                vq_vars, x, train=False, method=HierVQVAE.encode
            )
            if bottom_level:
                return idx_b, hier_cond_map(vq_vars, idx_t)
            return idx_t, None
    else:

        @jax.jit
        def encode(x):
            return model.apply(vq_vars, x, train=False, method=VQVAE.encode), None

    prior = _build_prior(args, spatial_cond=bottom_level)
    codes0, cond0 = encode(jnp.asarray(sample["x"]))
    warning = long_t_warning(getattr(args, "arch", "pixelcnn"), codes0.shape)
    if warning:
        print(warning)
    labels0 = jnp.asarray(
        sample.get("g", np.zeros(codes0.shape[0], np.int32)), jnp.int32
    )
    init_args = (codes0, labels0) + ((cond0,) if bottom_level else ())
    pvars = prior.init(jax.random.PRNGKey(args.seed), *init_args)

    def epoch_batches():
        for i, batch in enumerate(loaders["train"]):
            if args.max_batches_per_epoch and i >= args.max_batches_per_epoch:
                break
            codes, cond = encode(jnp.asarray(batch["x"]))
            labels = jnp.asarray(
                batch.get("g", np.zeros(codes.shape[0], np.int32)), jnp.int32
            )
            out = {"codes": codes, "labels": labels}
            if bottom_level:
                out["cond"] = cond
            yield out

    if getattr(args, "mesh_pipe", 1) > 1:
        _train_pp(args, cfg, prior, pvars, epoch_batches, loaders)
        return

    # the prior is the longest training stage of a real VQ-VAE pipeline —
    # it runs on the same mesh-aware Trainer as the autoencoder
    # (dp batch sharding; --mesh-model N tensor-shards layer kernels and
    # embeddings, with per-leaf moments auto-selected like cli/main.py)
    import dataclasses

    from neural_sound_generation_tpu.parallel import mesh_from_args
    from neural_sound_generation_tpu.training import Trainer, create_train_state

    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, initial_learning_rate=args.lr,
            batch_size=args.batch_size,
            ema_warmup=getattr(args, "ema_warmup", False),
        ),
    )
    tensor_parallel = args.mesh_model > 1
    state = create_train_state(
        pvars, cfg.train, fused=False if tensor_parallel else None
    )

    start_step, start_epoch = 0, 1
    train_dir = args.ckpt_dir.rstrip("/") + "_train"
    if getattr(args, "resume", False):
        if checkpoint.latest_step(train_dir) is not None:
            # full-fidelity resume: params, Adam moments, step counter
            # and the running EMA all continue (the *_train sibling is
            # written alongside every artifact save below)
            state, extra = checkpoint.restore(train_dir, state)
            start_epoch = int((extra or {}).get("epoch", 0)) + 1
            print(f"resumed train state from step "
                  f"{int(np.asarray(state.step))}, epoch {start_epoch}")
        elif checkpoint.latest_step(args.ckpt_dir) is not None:
            # artifact-only checkpoint (older runs): params + the EMA
            # sibling resume; optimizer moments restart at zero. The
            # restored step lands IN state.step (not a host-side
            # offset), so the *_train sibling written from here carries
            # the true counter and the next --resume does not regress
            # checkpoint numbering.
            at = checkpoint.latest_step(args.ckpt_dir)
            restored, extra = checkpoint.restore(
                args.ckpt_dir, {"params": state.params}
            )
            state = state.replace(
                params=restored["params"],
                step=jnp.asarray(at, state.step.dtype),
            )
            state = checkpoint.restore_ema_sibling(args.ckpt_dir, state)
            start_epoch = int((extra or {}).get("epoch", 0)) + 1
            print(f"resumed params from step {at}, "
                  f"epoch {start_epoch} (no *_train sibling: Adam "
                  f"moments restart)")

    mesh, _ = mesh_from_args(args.mesh_data, args.mesh_model, args.batch_size)
    trainer = Trainer(
        prior, cfg, state, mesh=mesh, tensor_parallel=tensor_parallel,
        log_fn=None, multi_steps=args.multi_steps,
    )

    def save_ckpt(state, step, completed_epoch):
        # artifact stays the {"params": ...} variables layout the sample
        # CLI and cli/serve.py --prior-ckpt restore into;
        # save_ema_sibling exports the averaged model alongside and the
        # *_train sibling carries the full state for --resume fidelity.
        # completed_epoch is the last FINISHED epoch — interval saves
        # inside epoch N store N-1 so a preempted run replays epoch N
        # with its pinned shuffle order rather than skipping its tail.
        at = start_step + int(step)
        extra = {"epoch": completed_epoch}
        checkpoint.save(
            args.ckpt_dir,
            {"params": jax.device_get(state.params)},
            step=at, extra=extra,
        )
        checkpoint.save_ema_sibling(args.ckpt_dir, state, step=at, extra=extra)
        checkpoint.save(train_dir, state, step=at, extra=extra, block=False)

    for epoch in range(start_epoch, args.epochs + 1):
        # shuffle order is f(seed, epoch): --resume replays the exact
        # batch order an uninterrupted run's epoch-N pass would see
        loaders["train"].set_epoch(epoch - 1)
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), epoch)
        means = trainer.train_epoch(
            epoch_batches(), key, epoch=epoch,
            checkpoint_cb=lambda s, st, e=epoch: save_ckpt(
                s, st, completed_epoch=e - 1
            ),
        )
        nll = means.get("loss", float("nan"))
        print(f"prior epoch {epoch}: nll/code {nll:.4f} "
              f"(ppl {np.exp(nll):.1f} of {args.z_dim})")
        save_ckpt(
            trainer.state,
            int(np.asarray(jax.device_get(trainer.state.step))),
            completed_epoch=epoch,
        )
    print(f"prior saved to {args.ckpt_dir}")
    if trainer.state.ema_params is not None:
        print("averaged-model (EMA) artifact saved to "
              f"{args.ckpt_dir.rstrip('/')}_ema")


def build_pp_train(prior, n_pipe: int, n_data: int, n_micro: int, lr: float,
                   train_cfg=None):
    """The CLI-reachable pipeline-parallel training machinery (also the
    path ``__graft_entry__.dryrun_multichip`` drives): DPxPP mesh via
    ``make_pp_mesh``, the SAME optimizer the dense path builds
    (``make_optimizer``: cfg betas/eps + clip/weight-decay when
    configured — a bare optax.adam silently dropped those), and the
    stage-sharded jitted train step from ``make_pp_prior_train_step``."""
    import dataclasses

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.parallel import pipeline as pp
    from neural_sound_generation_tpu.training.train_state import (
        make_optimizer,
    )

    mesh = pp.make_pp_mesh(n_pipe=n_pipe, n_data=n_data)
    train_cfg = train_cfg or Config().train
    tx = make_optimizer(
        dataclasses.replace(train_cfg, initial_learning_rate=lr)
    )
    init_fn, step_fn = pp.make_pp_prior_train_step(prior, mesh, n_micro, tx)
    return mesh, tx, init_fn, step_fn


def _train_pp(args, cfg, prior, pvars, epoch_batches, loaders):
    """GPipe pipeline-parallel prior training (``--mesh-pipe N > 1``).

    The block stack AND its Adam moments live sharded over the mesh's
    'pipe' axis for the whole run (each device holds n_layers/N layers'
    weights + moments — PP's memory claim), composing with '--mesh-data'
    as DP x PP. Checkpoints are exported DENSE: the artifact is the
    mesh-width-independent ``{..., block_i: ...}`` layout ``sample`` and
    ``serve --prior-ckpt`` restore directly, and the ``*_pp_train``
    sibling stores params + moments in the same dense layout — so a pp4
    run resumes under pp2 or dense (cross-layout lifecycle). The
    lifecycle itself lives in cli/_pp.run_pp_training, shared with the
    vocoder CLI. The reference has no pipeline engine at all
    (SURVEY §2a)."""
    from neural_sound_generation_tpu.cli._pp import (
        run_pp_training, validate_pp_mesh,
    )
    from neural_sound_generation_tpu.parallel import pipeline as pp

    if getattr(args, "arch", "pixelcnn") != "transformer":
        raise SystemExit(
            "--mesh-pipe stages the transformer prior's uniform block "
            "stack; use --arch transformer (the pixelcnn layers are not "
            "a uniform stack)"
        )
    n_pipe = args.mesh_pipe
    if prior.n_layers % n_pipe:
        raise SystemExit(
            f"--prior-layers {prior.n_layers} does not stage evenly "
            f"over --mesh-pipe {n_pipe}"
        )
    n_data = args.mesh_data or 1
    n_micro = args.pp_microbatches or n_pipe
    validate_pp_mesh(n_pipe, n_data, n_micro, args.batch_size)

    def step_batches():
        for batch in epoch_batches():
            out = {"codes": batch["codes"], "labels": batch["labels"]}
            if "cond" in batch:
                # hier-bottom spatial conditioning: consumed by the
                # replicated embed_sequence outside the staged loop
                out["cond"] = batch["cond"]
            yield out

    run_pp_training(
        ckpt_dir=args.ckpt_dir,
        resume=getattr(args, "resume", False),
        epochs=args.epochs,
        n_pipe=n_pipe, n_data=n_data, n_micro=n_micro,
        checkpoint_interval=cfg.train.checkpoint_interval,
        set_epoch=loaders["train"].set_epoch,
        epoch_batches=step_batches,
        build=lambda p, d, m: build_pp_train(
            prior, p, d, m, args.lr, train_cfg=cfg.train
        ),
        partition=lambda v, mesh: pp.pp_prior_partition(prior, v, mesh),
        unpartition=lambda r, s: pp.pp_prior_unpartition(prior, r, s),
        split_dense=lambda dense: pp.pp_prior_split(prior, dense),
        variables=pvars,
        kind="prior",
        ema_decay=(cfg.train.ema_decay
                   if cfg.train.exponential_moving_average else 0.0),
        ema_warmup=getattr(args, "ema_warmup", False),
        epoch_line=lambda epoch, nll: (
            f"prior epoch {epoch}: nll/code {nll:.4f} "
            f"(ppl {np.exp(nll):.1f} of {args.z_dim})"
        ),
    )


def cmd_sample(args):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.inference import (
        codes_to_audio, prior_generate,
    )
    from neural_sound_generation_tpu.ops import dsp
    from neural_sound_generation_tpu.training import checkpoint

    cfg = _prior_cfg(args)
    h, w = args.code_shape

    if args.hier:
        from neural_sound_generation_tpu.inference import sample_hier_audio
        from neural_sound_generation_tpu.training import checkpoint as ckpt_mod

        if not args.bottom_ckpt:
            raise SystemExit("--hier sampling requires --bottom-ckpt")
        # code_shape names the TOP grid for hier; input is 8x that
        sample_x = jnp.zeros((1, h * 8, w * 8, 1))
        model, vq_vars = _load_vqvae(args, sample_x)
        top = _build_prior(args, spatial_cond=False)
        bottom = _build_prior(_bottom_args(args), spatial_cond=True)
        lab0 = jnp.zeros((1,), jnp.int32)
        tv = top.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h, w), jnp.int32), lab0
        )
        bv = bottom.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 2 * h, 2 * w), jnp.int32),
            lab0, jnp.zeros((1, 2 * h, 2 * w, args.dim)),
        )
        tv, _ = ckpt_mod.restore(args.prior_ckpt, tv)
        bv, _ = ckpt_mod.restore(args.bottom_ckpt, bv)
        tv, bv = jax.device_put((tv, bv))
        labels = jnp.full((args.num_samples,), args.label, jnp.int32)
        _, _, wavs = sample_hier_audio(
            model, vq_vars, top, tv, bottom, bv, labels, (h, w),
            cfg.audio, jax.random.PRNGKey(args.seed),
        )
        os.makedirs(args.output_dir, exist_ok=True)
        for i in range(args.num_samples):
            path = os.path.join(args.output_dir, f"hier_sample_{i:03d}.wav")
            dsp.save_wav(np.asarray(wavs[i]), path, cfg.audio.sample_rate)
        print(f"wrote {args.num_samples} hier samples to {args.output_dir}")
        return

    sample_x = jnp.zeros((1, h * 4, w * 4, 1))
    model, vq_vars = _load_vqvae(args, sample_x, cfg)

    prior = _build_prior(args, spatial_cond=False)
    codes0 = jnp.zeros((1, h, w), jnp.int32)
    template = prior.init(jax.random.PRNGKey(0), codes0, jnp.zeros((1,), jnp.int32))
    pvars, _ = checkpoint.restore(args.prior_ckpt, template)
    pvars = jax.device_put(pvars)

    labels = jnp.full((args.num_samples,), args.label, jnp.int32)
    key = jax.random.PRNGKey(args.seed)
    codes = prior_generate(
        prior, pvars, labels, key, shape=(h, w), batch_size=args.num_samples
    )
    # speaker-conditioned decoder (multispeaker preset): the class label
    # IS the speaker id — decode the samples as that speaker
    g = labels if getattr(model, "n_speakers", 0) > 0 else None
    wavs = codes_to_audio(model, vq_vars, codes, cfg.audio, key, g=g)
    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.num_samples):
        path = os.path.join(args.output_dir, f"prior_sample_{i:03d}.wav")
        dsp.save_wav(np.asarray(wavs[i]), path, cfg.audio.sample_rate)
    print(f"wrote {args.num_samples} samples to {args.output_dir}")


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    args = parse_args(argv)
    {"train": cmd_train, "sample": cmd_sample}[args.cmd](args)


if __name__ == "__main__":
    main(sys.argv[1:])
