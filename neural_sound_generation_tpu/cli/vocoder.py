"""WaveNet vocoder CLI: train + synthesize.

Completes the reference's ``builder="wavenet"`` configuration surface
(src/hparams.py:12, 52-84) as a runnable pipeline: ``train`` fits the
mel-conditioned WaveNet on a preprocessed corpus with the configured loss
(MoL for scalar input, cross-entropy for mulaw-quantize); ``synthesize``
runs the fast scan generator conditioned on a stored mel shard.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax
import jax.numpy as jnp


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="WaveNet vocoder train/synthesize")
    sub = p.add_subparsers(dest="cmd", required=True)

    tr = sub.add_parser("train")
    tr.add_argument("--datadir", required=True)
    tr.add_argument("--ckpt-dir", default="./models/wavenet")
    tr.add_argument("--preset", default=None)
    tr.add_argument("--batch-size", type=int, default=2)
    tr.add_argument("--epochs", type=int, default=2000)
    tr.add_argument("--layers", type=int, default=None)
    tr.add_argument("--stacks", type=int, default=None)
    tr.add_argument("--residual-channels", type=int, default=None)
    tr.add_argument("--max-batches-per-epoch", type=int, default=None)
    tr.add_argument("--seed", type=int, default=0)
    tr.add_argument("--resume", action="store_true",
                    help="continue from the latest checkpoint in "
                         "--ckpt-dir: params, Adam moments, EMA, step "
                         "numbering, epoch count, and the epoch's "
                         "shuffle order all resume via the *_train "
                         "sibling (older artifact-only checkpoints "
                         "resume params + EMA; moments restart)")
    tr.add_argument("--mesh-data", type=int, default=None)
    tr.add_argument("--mesh-model", type=int, default=1,
                    help="tensor-parallel shards for the vocoder (res/"
                         "skip/cond conv channels over the 'model' axis)")
    tr.add_argument("--mesh-pipe", type=int, default=1,
                    help="GPipe pipeline-parallel stages for the WaveNet "
                         "residual stacks: stack weights AND Adam "
                         "moments live sharded over the 'pipe' axis "
                         "(static dilations inside each stage program); "
                         "composes with --mesh-data as DPxPP; "
                         "checkpoints export the flat layout "
                         "`synthesize` restores, so runs resume at any "
                         "pipe width; the EMA shadow rides the same "
                         "stage-sharded layout and exports *_ema")
    tr.add_argument("--pp-microbatches", type=int, default=None,
                    help="GPipe microbatches per step (default: "
                         "--mesh-pipe); must divide --batch-size")
    tr.add_argument("--multi-steps", type=int, default=1,
                    help="optimization steps per device launch (lax.scan)")
    tr.add_argument("--bf16", action="store_true",
                    help="bfloat16 teacher-forced compute (params stay "
                         "f32, loss logits f32; measured in PERF.md)")
    tr.add_argument("--ema-warmup", action="store_true",
                    help="ramp the EMA decay min(decay, (1+t)/(10+t)) so "
                         "short runs export a non-stale *_ema artifact "
                         "(fixed reference decay otherwise)")
    _units_args(tr)

    sy = sub.add_parser("synthesize")
    sy.add_argument("--ckpt-dir", required=True)
    sy.add_argument("--mel-npy", default=None, help="time-major mel .npy "
                    "(required for --condition mel)")
    sy.add_argument("--wav-in", default=None,
                    help="source wav for --condition units: encoded to "
                         "units by the frozen WaveVQVAE, then resynthesized "
                         "through the WaveNet (the ZeroSpeech-style "
                         "units -> autoregressive-decoder chain)")
    _units_args(sy)
    sy.add_argument("--output", required=True)
    sy.add_argument("--preset", default=None)
    sy.add_argument("--layers", type=int, default=None)
    sy.add_argument("--stacks", type=int, default=None)
    sy.add_argument("--residual-channels", type=int, default=None)
    sy.add_argument("--max-frames", type=int, default=40)
    sy.add_argument("--seed", type=int, default=0)
    sy.add_argument("--speaker-id", type=int, default=None,
                    help="speaker id for a speaker-conditioned checkpoint "
                         "(gin_channels > 0, e.g. the multispeaker "
                         "cmu_arctic preset); required when the model "
                         "carries speaker embeddings")
    sy.add_argument("--gen-precision", choices=["bf16", "f32"],
                    default="bf16",
                    help="matmul dtype for the sampling scan; bf16 is the "
                    "production default (1.8x realtime single-stream on "
                    "v5e vs 0.8x for f32, PERF.md), f32 for bit-level "
                    "parity with teacher-forced evaluation")
    return p.parse_args(argv)


def _units_args(p):
    """The units->WaveNet decode-chain surface, shared by train and
    synthesize: a frozen WaveVQVAE's quantized latents replace the mel
    conditioning — the autoregressive decoder the raw-waveform family
    needs for sample-level fidelity (PERF.md round-5 wave soak: the
    strided-conv decoder's conditional-mean ceiling)."""
    p.add_argument("--condition", choices=["mel", "units"], default="mel",
                   help="conditioning signal: preprocessed mels (the "
                        "reference chain) or a frozen WaveVQVAE's "
                        "quantized unit latents (--units-vqvae-ckpt)")
    p.add_argument("--units-vqvae-ckpt", default=None,
                   help="trained WaveVQVAE checkpoint providing the units")
    p.add_argument("--units-dim", type=int, default=256,
                   help="WaveVQVAE hidden width (= conditioning channels)")
    p.add_argument("--units-z-dim", type=int, default=512)
    p.add_argument("--units-downsample", type=int, default=6,
                   help="WaveVQVAE stride-2 layers (unit hop = 2^n)")
    p.add_argument("--units-num-quantizers", type=int, default=1)


def _units_scales(num_downsample: int):
    """Transposed-conv upsample factors multiplying to the unit hop
    2^num_downsample (6 -> (4,4,4), 5 -> (4,4,2), 4 -> (4,4))."""
    scales, n = [], int(num_downsample)
    while n >= 2:
        scales.append(4)
        n -= 2
    if n:
        scales.append(2)
    return tuple(scales)


def _build_units_encoder(args, cfg):
    """Frozen WaveVQVAE -> jitted waveform->z_q conditioning fn."""
    from neural_sound_generation_tpu.models import WaveVQVAE
    from neural_sound_generation_tpu.training import (
        checkpoint, create_train_state,
    )

    if not args.units_vqvae_ckpt:
        raise SystemExit(
            "--condition units requires --units-vqvae-ckpt "
            "(a trained wavevqvae checkpoint)"
        )
    model = WaveVQVAE(
        dim=args.units_dim, z_dim=args.units_z_dim,
        num_downsample=args.units_downsample,
        input_type=cfg.audio.input_type,
        quantize_channels=cfg.audio.quantize_channels,
        num_quantizers=args.units_num_quantizers,
    )
    hop = model.hop
    x0 = (
        jnp.zeros((1, 2 * hop), jnp.int32)
        if cfg.audio.is_mulaw_quantize
        else jnp.zeros((1, 2 * hop, 1))
    )
    variables = model.init(jax.random.PRNGKey(0), x0, train=False)
    state = create_train_state(variables, cfg.train)
    state, _ = checkpoint.restore(args.units_vqvae_ckpt, state)
    # eval_params: the EMA shadow when the checkpoint carries one — the
    # same weights evaluate/serve treat as the model's inference params,
    # so the units the WaveNet trains on match the measured unit model
    ev = jax.device_put(
        {"params": state.eval_params, "batch_stats": state.batch_stats}
    )

    @jax.jit
    def units_cond(x):
        return model.apply(
            ev, x, train=False, method=WaveVQVAE.quantized_latents
        )

    return units_cond, model


def build_model(cfg, args):
    from neural_sound_generation_tpu.models import WaveNet

    arch = cfg.arch
    scalar = cfg.audio.is_scalar_input
    out_channels = arch.out_channels
    if not scalar:
        out_channels = cfg.audio.quantize_channels
    residual = args.residual_channels or arch.residual_channels
    cin = arch.cin_channels
    scales = tuple(arch.upsample_scales)
    if getattr(args, "condition", "mel") == "units":
        # units conditioning: cin = the WaveVQVAE latent width, and the
        # upsampler must expand by the unit hop (2^num_downsample)
        cin = args.units_dim
        scales = _units_scales(args.units_downsample)
    return WaveNet(
        out_channels=out_channels,
        layers=args.layers or arch.layers,
        stacks=args.stacks or arch.stacks,
        residual_channels=residual,
        gate_channels=residual,
        skip_out_channels=min(arch.skip_out_channels, residual),
        kernel_size=arch.kernel_size,
        cin_channels=cin,
        gin_channels=arch.gin_channels,
        n_speakers=arch.n_speakers,
        upsample_scales=scales,
        scalar_input=scalar,
        quantize_channels=cfg.audio.quantize_channels,
        dtype=jnp.bfloat16 if getattr(args, "bf16", False)
        else jnp.float32,
    )


def _load_cfg(args):
    from neural_sound_generation_tpu.config import Config, load_preset

    cfg = Config()
    if args.preset:
        cfg = load_preset(args.preset, cfg)
    return cfg


def cmd_train(args):
    import dataclasses

    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import WaveNet
    from neural_sound_generation_tpu.parallel import mesh_from_args
    from neural_sound_generation_tpu.training import (
        Trainer,
        checkpoint,
        create_train_state,
    )

    cfg = _load_cfg(args)
    scalar = cfg.audio.is_scalar_input
    loaders = get_audio_data_loaders(
        args.datadir, None, args.batch_size, cfg, batch_mode="raw"
    )
    model = build_model(cfg, args)
    units_fn = None
    if getattr(args, "condition", "mel") == "units":
        units_fn, units_model = _build_units_encoder(args, cfg)
        uhop = units_model.hop

    def convert(batch):
        """(targets, conditioning) for the configured chain: mel from
        the preprocessed shards, or the frozen WaveVQVAE's quantized
        latents of the TARGET waveform itself (the units decode chain —
        teacher-forcing the decoder half of the raw-waveform VQ-VAE).
        In units mode the mel block is never converted/uploaded."""
        if units_fn is not None:
            targets, _ = _batch_to_wavenet(batch, cfg, with_mel=False)
            t = targets.shape[1] - targets.shape[1] % uhop
            targets = targets[:, :t]
            return targets, units_fn(targets)
        return _batch_to_wavenet(batch, cfg)

    sample = next(iter(loaders["train"]))
    targets, c = convert(sample)
    g = _batch_speakers(sample)
    x = WaveNet.shift_inputs(targets, scalar)
    variables = model.init(jax.random.PRNGKey(args.seed), x, c, g)

    def epoch_batches():
        for i, batch in enumerate(loaders["train"]):
            if args.max_batches_per_epoch and i >= args.max_batches_per_epoch:
                break
            targets, c = convert(batch)
            g = _batch_speakers(batch)
            out = {
                "y": targets,
                "c": c,
                "input_lengths": jnp.asarray(batch["input_lengths"]),
            }
            if g is not None:
                out["g"] = g
            yield out

    if getattr(args, "mesh_pipe", 1) > 1:
        _train_pp(args, cfg, model, variables, epoch_batches, loaders)
        return

    # the vocoder trains on the same mesh-aware Trainer as the other
    # families (dp batch sharding, --mesh-model N tensor parallelism,
    # multi-step scan, checkpoint-interval callback) instead of an
    # ad-hoc single-device loop
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=args.batch_size,
            ema_warmup=getattr(args, "ema_warmup", False),
        )
    )
    tensor_parallel = args.mesh_model > 1
    state = create_train_state(
        variables, cfg.train, fused=False if tensor_parallel else None
    )

    start_step, start_epoch = 0, 1
    train_dir = args.ckpt_dir.rstrip("/") + "_train"
    if args.resume:
        # a --resume whose --condition/--units-* flags differ from the
        # checkpoint's recorded chain would graft a mismatched model
        for d in (train_dir, args.ckpt_dir):
            if checkpoint.latest_step(d) is not None:
                _check_condition_meta(args, checkpoint.read_extra(d))
                break
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
        model, cfg, state, mesh=mesh, tensor_parallel=tensor_parallel,
        log_fn=None, multi_steps=args.multi_steps,
    )

    def save_ckpt(state, step, completed_epoch):
        # artifact stays the {"params": ...} variables layout the
        # synthesize CLI (and serve --vocoder-ckpt) restore into;
        # save_ema_sibling exports the averaged model alongside and the
        # *_train sibling carries the full state for --resume fidelity.
        # completed_epoch is the last FINISHED epoch — interval saves
        # inside epoch N store N-1 so a preempted run replays epoch N
        # with its pinned shuffle order rather than skipping its tail.
        at = start_step + int(step)
        extra = {"epoch": completed_epoch, **_condition_meta(args)}
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
        print(f"wavenet epoch {epoch}: loss {means.get('loss', float('nan')):.4f}")
        save_ckpt(
            trainer.state,
            int(np.asarray(jax.device_get(trainer.state.step))),
            completed_epoch=epoch,
        )
    if trainer.state.ema_params is not None:
        print("averaged-model (EMA) artifact saved to "
              f"{args.ckpt_dir.rstrip('/')}_ema")


def build_pp_vocoder_train(model, cfg, n_pipe: int, n_data: int,
                           n_micro: int, lr: float, bf16: bool = False):
    """The CLI-reachable pipeline-parallel vocoder training machinery
    (also the path ``__graft_entry__.dryrun_multichip`` exercises):
    DPxPP mesh, the SAME optimizer the dense path builds
    (``make_optimizer``: cfg betas/eps + clip/weight-decay when
    configured), and the stage-sharded jitted train step from
    ``make_pp_wavenet_train_step`` (teacher-forced MoL / masked CE on
    the last stage)."""
    import dataclasses

    from neural_sound_generation_tpu.parallel import pipeline as pp
    from neural_sound_generation_tpu.training.train_state import (
        make_optimizer,
    )

    mesh = pp.make_pp_mesh(n_pipe=n_pipe, n_data=n_data)
    tx = make_optimizer(
        dataclasses.replace(cfg.train, initial_learning_rate=lr)
    )
    init_fn, step_fn = pp.make_pp_wavenet_train_step(
        model, cfg, mesh, n_micro, tx, bf16=bf16
    )
    return mesh, tx, init_fn, step_fn


def _train_pp(args, cfg, model, variables, epoch_batches, loaders):
    """GPipe pipeline-parallel vocoder training (``--mesh-pipe N > 1``).

    The residual stacks AND their Adam moments live sharded over the
    'pipe' axis (each device holds stacks/N stacks, with every dilation
    static inside its stage program). Checkpoints export the flat
    ``{name}_{i}`` layout — the artifact ``synthesize`` and ``serve
    --vocoder-ckpt`` restore directly, and the ``*_pp_train`` sibling's
    dense moments re-partition at any pipe width on resume. The
    lifecycle lives in cli/_pp.run_pp_training, shared with the prior
    CLI. The WaveNet is the framework's largest model — this is the PP
    flagship the round-3 fwd/grad-only staging lacked."""
    from neural_sound_generation_tpu.cli._pp import (
        run_pp_training, validate_pp_mesh,
    )
    from neural_sound_generation_tpu.parallel import pipeline as pp

    n_pipe = args.mesh_pipe
    if model.stacks % n_pipe:
        raise SystemExit(
            f"--stacks {model.stacks} does not stage evenly over "
            f"--mesh-pipe {n_pipe}"
        )
    bf16 = bool(getattr(args, "bf16", False))
    if bf16:
        # the staged path takes the f32 MODULE and selects bf16 stage
        # math explicitly (params stay f32, loss head f32 — the dense
        # --bf16 convention); rebuild the module f32 so the staged
        # kernels control the compute dtype
        import copy as _copy

        a2 = _copy.copy(args)
        a2.bf16 = False
        model = build_model(cfg, a2)
    if model.cin_channels <= 0:
        raise SystemExit(
            "--mesh-pipe requires mel conditioning (cin_channels > 0)"
        )
    n_data = args.mesh_data or 1
    n_micro = args.pp_microbatches or n_pipe
    validate_pp_mesh(n_pipe, n_data, n_micro, args.batch_size)
    if args.resume:
        from neural_sound_generation_tpu.training import checkpoint

        for d in (args.ckpt_dir.rstrip("/") + "_pp_train", args.ckpt_dir):
            if checkpoint.latest_step(d) is not None:
                _check_condition_meta(args, checkpoint.read_extra(d))
                break

    def step_batches():
        for batch in epoch_batches():
            if model.gin_channels > 0:
                # speaker ids thread through the staged path: the
                # embedding rides the stage-local broadcast, the
                # per-layer g convs are staged with their stacks
                yield batch
            else:
                # a gin<=0 model ignores speaker ids; corpora that carry
                # them (cmu_arctic layouts) must still train under PP
                yield {k: v for k, v in batch.items() if k != "g"}

    run_pp_training(
        ckpt_dir=args.ckpt_dir,
        resume=args.resume,
        epochs=args.epochs,
        n_pipe=n_pipe, n_data=n_data, n_micro=n_micro,
        checkpoint_interval=cfg.train.checkpoint_interval,
        set_epoch=loaders["train"].set_epoch,
        epoch_batches=step_batches,
        build=lambda p, d, m: build_pp_vocoder_train(
            model, cfg, p, d, m, cfg.train.initial_learning_rate,
            bf16=bf16,
        ),
        partition=lambda v, mesh: pp.wavenet_stack_params(model, v, mesh),
        unpartition=lambda r, s: pp.wavenet_unstack_params(model, r, s),
        split_dense=lambda dense: pp.wavenet_stack_params(
            model, {"params": dense}
        ),
        variables=variables,
        kind="wavenet",
        ema_decay=(cfg.train.ema_decay
                   if cfg.train.exponential_moving_average else 0.0),
        ema_warmup=getattr(args, "ema_warmup", False),
        extra_meta=_condition_meta(args),
        epoch_line=lambda epoch, loss: (
            f"wavenet epoch {epoch}: loss {loss:.4f}"
        ),
    )


def _condition_meta(args) -> dict:
    """Checkpoint metadata describing the conditioning chain, written
    into every save's ``extra`` and validated at synthesize time — a
    units checkpoint restored with mismatched (or forgotten) --units-*
    flags would otherwise silently graft fresh-init upsampler/cond
    weights and emit garbage audio."""
    if getattr(args, "condition", "mel") != "units":
        return {"condition": "mel"}
    return {
        "condition": "units",
        "units_dim": int(args.units_dim),
        "units_z_dim": int(args.units_z_dim),
        "units_downsample": int(args.units_downsample),
        "units_num_quantizers": int(args.units_num_quantizers),
    }


def _check_condition_meta(args, extra) -> None:
    """SystemExit when the checkpoint's recorded conditioning chain
    does not match the synthesize flags (older checkpoints without the
    metadata pass through)."""
    meta = extra or {}
    if "condition" not in meta:
        return
    want = _condition_meta(args)
    if meta["condition"] != want["condition"]:
        raise SystemExit(
            f"this checkpoint was trained with --condition "
            f"{meta['condition']}; rerun with matching flags"
        )
    for k, v in want.items():
        if k != "condition" and int(meta.get(k, v)) != int(v):
            raise SystemExit(
                f"checkpoint metadata {k}={meta[k]} does not match "
                f"--{k.replace('_', '-')} {v}; the restored model "
                f"would be a silent architecture mismatch"
            )


def _batch_to_wavenet(batch, cfg, with_mel: bool = True):
    """Raw collate batch -> (targets, mel conditioning). ``with_mel=
    False`` skips the mel conversion/upload entirely (units-conditioned
    training never reads it)."""
    if cfg.audio.is_mulaw_quantize:
        targets = jnp.asarray(batch["y"], jnp.int32)
    else:
        targets = jnp.asarray(batch["y"], jnp.float32)[..., None]
    if not with_mel:
        return targets, None
    c = jnp.asarray(batch["c"]).transpose(0, 2, 1)  # (B, T', n_mels)
    return targets, c


def _batch_speakers(batch):
    g = batch.get("g")
    return jnp.asarray(g, jnp.int32) if g is not None else None


def cmd_synthesize(args):
    from neural_sound_generation_tpu.models.wavenet import make_generate_fn
    from neural_sound_generation_tpu.ops import dsp
    from neural_sound_generation_tpu.training import checkpoint

    cfg = _load_cfg(args)
    # validate the recorded conditioning chain BEFORE building anything:
    # a mismatched --units-* flag would otherwise fail deep inside the
    # units encoder (or silently graft a wrong-architecture WaveNet)
    _check_condition_meta(args, checkpoint.read_extra(args.ckpt_dir))
    model = build_model(cfg, args)
    if getattr(args, "condition", "mel") == "units":
        # resynthesis chain: wav -> frozen WaveVQVAE units -> WaveNet
        if not args.wav_in:
            raise SystemExit("--condition units synthesize needs --wav-in")
        units_fn, units_model = _build_units_encoder(args, cfg)
        wav_np = np.asarray(
            dsp.load_wav(args.wav_in, cfg.audio.sample_rate)
        )
        # same preprocessing the training corpus received (peak rescale
        # BEFORE companding, data/corpora/engine.py:192-198) — without
        # it a quiet source wav produces units off the frozen encoder's
        # training distribution, and a full-scale +1.0 sample would
        # mulaw-quantize to index Q (one past the embedding). Silence
        # trimming is deliberately skipped: it would shift timing
        # relative to the source.
        if cfg.audio.rescaling:
            wav_np = (
                wav_np / max(np.abs(wav_np).max(), 1e-8)
                * cfg.audio.rescaling_max
            )
        wav = jnp.asarray(wav_np.astype(np.float32))
        if cfg.audio.is_mulaw_quantize:
            x_in = jnp.clip(
                dsp.mulaw_quantize(wav, cfg.audio.quantize_channels),
                0, cfg.audio.quantize_channels - 1,
            )
        elif cfg.audio.is_mulaw:
            x_in = dsp.mulaw(wav, cfg.audio.quantize_channels)
        else:
            x_in = wav
        uhop = units_model.hop
        t = min(
            int(x_in.shape[0]) - int(x_in.shape[0]) % uhop,
            args.max_frames * uhop,
        )
        if t <= 0:
            raise SystemExit(
                f"--wav-in shorter than one unit hop ({uhop} samples)"
            )
        x_in = x_in[:t]
        if not cfg.audio.is_mulaw_quantize:
            x_in = x_in[..., None]
        c = units_fn(x_in[None])              # (1, T', units_dim)
        length = int(c.shape[1]) * uhop
    else:
        if not args.mel_npy:
            raise SystemExit("--condition mel synthesize needs --mel-npy")
        mel = np.load(args.mel_npy)[: args.max_frames]  # (frames, n_mels)
        c = jnp.asarray(mel, jnp.float32)[None, ...]
        length = mel.shape[0] * cfg.audio.effective_hop_size

    g = None
    if model.gin_channels > 0:
        if args.speaker_id is None:
            raise SystemExit(
                "this checkpoint is speaker-conditioned (gin_channels "
                f"{model.gin_channels}): pass --speaker-id 0.."
                f"{model.n_speakers - 1}"
            )
        g = jnp.asarray([args.speaker_id], jnp.int32)
    elif args.speaker_id is not None:
        raise SystemExit(
            "--speaker-id given but the model has no speaker embeddings "
            "(gin_channels <= 0); use the multispeaker preset"
        )
    x0 = model.shift_inputs(
        jnp.zeros((1, 8, 1))
        if cfg.audio.is_scalar_input
        else jnp.zeros((1, 8), jnp.int32),
        cfg.audio.is_scalar_input,
    )
    template = model.init(jax.random.PRNGKey(0), x0, c, g)
    variables, _ = checkpoint.restore(args.ckpt_dir, template)
    variables = jax.device_put(variables)

    gen = make_generate_fn(
        model, length,
        dtype=jnp.bfloat16 if args.gen_precision == "bf16" else None,
    )
    out = gen(variables, c, g, jax.random.PRNGKey(args.seed), batch_size=1)
    wav = np.asarray(out)[0]
    if cfg.audio.is_mulaw_quantize:
        wav = np.asarray(
            dsp.inv_mulaw_quantize(jnp.asarray(wav), cfg.audio.quantize_channels)
        )
    elif cfg.audio.is_mulaw:
        wav = np.asarray(dsp.inv_mulaw(jnp.asarray(wav), cfg.audio.quantize_channels))
    dsp.save_wav(wav, args.output, cfg.audio.sample_rate)
    print(f"synthesized {len(wav)} samples -> {args.output}")


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    args = parse_args(argv)
    {"train": cmd_train, "synthesize": cmd_synthesize}[args.cmd](args)


if __name__ == "__main__":
    main(sys.argv[1:])
