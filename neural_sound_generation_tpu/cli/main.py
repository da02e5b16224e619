"""Training CLI.

Reference surface (src/main.py:25-58): ``--batch-size --lr-rate --dataset
--datadir --sampledir --epochs --seed --log-interval --model --beta --dim
--z-dim`` over datasets {MNIST, CIFAR10, ljspeech} and models {vae, vqvae}.
Additions over the reference: ``--preset`` config overlay, ``--resume``
(restore is new — the reference can only save), and mesh axes for
multi-chip runs.

Behavioral parity: per-epoch train + test, per-epoch reconstruction
artifact dump (``.npy`` + Griffin-Lim ``.wav`` for ljspeech,
src/main.py:137-220), checkpoint every epoch and on Ctrl-C
(src/main.py:221-229).
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from neural_sound_generation_tpu.config import Config, load_preset
from neural_sound_generation_tpu.data import get_audio_data_loaders
from neural_sound_generation_tpu.data.images import (
    image_batches,
    load_cifar10,
    load_mnist,
)
from neural_sound_generation_tpu.models import VAE, VQVAE, WaveVQVAE
from neural_sound_generation_tpu.ops import dsp
from neural_sound_generation_tpu.parallel import mesh_from_args
from neural_sound_generation_tpu.training import (
    Trainer,
    checkpoint,
    create_train_state,
)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train VAE/VQ-VAE on TPU")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--lr-rate", type=float, default=1e-3)
    p.add_argument("--dataset", type=str, default="MNIST",
                   choices=["MNIST", "CIFAR10", "ljspeech", "cmu_arctic",
                            "jsut", "librivox"])
    p.add_argument("--datadir", type=str, default="./data/")
    p.add_argument("--sampledir", type=str, default="./results/")
    p.add_argument("--epochs", type=int, default=3000)
    p.add_argument("--seed", type=int, default=1)
    p.add_argument("--log-interval", type=int, default=10)
    p.add_argument("--model", type=str, default="vae",
                   choices=["vae", "vqvae", "wavevqvae", "hiervqvae"])
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--dim", type=int, default=1, help="hidden layer width")
    p.add_argument("--z-dim", type=int, default=512)
    # framework additions
    p.add_argument("--preset", type=str, default=None)
    p.add_argument("--ckpt-dir", type=str, default="./models")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--mesh-data", type=int, default=None)
    p.add_argument("--mesh-model", type=int, default=1)
    p.add_argument("--speaker-id", type=int, default=None)
    p.add_argument("--max-batches-per-epoch", type=int, default=None)
    p.add_argument("--norm", choices=["batch", "group"], default="batch")
    p.add_argument("--multi-steps", type=int, default=1,
                   help="optimization steps per device launch (lax.scan)")
    p.add_argument("--ema-codebook", action="store_true",
                   help="EMA codebook updates instead of gradient descent")
    p.add_argument("--restart-dead-threshold", type=float, default=0.0,
                   help="re-seed codes whose EMA cluster size drops below "
                        "this (requires --ema-codebook)")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (params stay f32; measured +9-12%% "
                        "throughput on TPU v5e, see PERF.md)")
    p.add_argument("--num-downsample", type=int, default=6,
                   help="wavevqvae: stride-2 encoder layers; unit rate "
                        "is sr/2^n (6 = 64x ZeroSpeech-style units, "
                        "4 = 16x for waveform fidelity)")
    p.add_argument("--codebook-init", choices=["uniform", "data"],
                   default="uniform",
                   help="'data' seeds the codebook from encoder outputs "
                        "of a warmup batch (Jukebox-style random-sample "
                        "init) instead of the reference's U(+-1/K) ball "
                        "at the origin — fights the code-collapse the "
                        "wave domain exhibits (PERF.md round-5 wave "
                        "soak); vqvae/wavevqvae/hiervqvae families "
                        "(hier seeds top first, then the bottom under "
                        "the seeded top)")
    p.add_argument("--num-quantizers", type=int, default=1,
                   help="residual VQ stages (1 = single codebook)")
    p.add_argument("--ema-warmup", action="store_true",
                   help="ramp the parameter-EMA decay as min(decay, "
                        "(1+t)/(10+t)) (tf.train.ExponentialMovingAverage "
                        "num_updates semantics). The reference's fixed "
                        "decay (default) leaves the eval/EMA shadow near "
                        "the init weights for ~10k steps, so short runs "
                        "evaluate a stale averaged model — turn this on "
                        "for runs much shorter than 1/(1-ema_decay) "
                        "steps (TrainConfig.ema_warmup)")
    p.add_argument("--bf16-moments", action="store_true",
                   help="store the fused optimizer's Adam moments in "
                        "bfloat16 (halves the bandwidth-bound optimizer "
                        "stage's bytes; update math stays f32 — see "
                        "TrainConfig.bf16_moments)")
    return p.parse_args(argv)


def build_config(args) -> Config:
    cfg = Config()
    if args.preset:
        cfg = load_preset(args.preset, cfg)
    cfg = cfg.parse_json(
        {
            "batch_size": args.batch_size,
            "initial_learning_rate": args.lr_rate,
        }
    )
    return dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            model=args.model,
            input_dim=3 if args.dataset == "CIFAR10" else 1,
            dim=args.dim,
            z_dim=args.z_dim,
            beta=args.beta,
            ema_codebook=getattr(args, "ema_codebook", False),
            restart_dead_threshold=getattr(args, "restart_dead_threshold", 0.0),
            num_quantizers=getattr(args, "num_quantizers", 1),
            num_downsample=getattr(args, "num_downsample", 6),
        ),
        train=dataclasses.replace(
            cfg.train,
            seed=args.seed,
            log_interval=args.log_interval,
            nepochs=args.epochs,
            bf16_moments=getattr(args, "bf16_moments", False),
            ema_warmup=getattr(args, "ema_warmup", False),
        ),
    )


def _checkpoint_dir(args) -> str:
    # ./models/{model}/checkpoint_{dataset}_{dim}_{z_dim} (main.py:61-66 layout)
    return os.path.join(
        args.ckpt_dir,
        args.model,
        f"checkpoint_{args.dataset}_{args.dim}_{args.z_dim}",
    )


def make_model(
    cfg: Config, n_speakers: int = 0, norm: str = "batch",
    dtype=None,
):
    mc = cfg.model
    dtype = dtype or jnp.float32
    if mc.model == "vae":
        return VAE(input_dim=mc.input_dim, dim=mc.dim, z_dim=mc.z_dim)
    if mc.model == "hiervqvae":
        from neural_sound_generation_tpu.models import HierVQVAE

        return HierVQVAE(
            input_dim=mc.input_dim, dim=mc.dim, z_dim=mc.z_dim,
            norm=norm, dtype=dtype,
        )
    gin = cfg.arch.gin_channels if n_speakers > 0 else -1
    if mc.model == "wavevqvae":
        return WaveVQVAE(
            dim=mc.dim,
            z_dim=mc.z_dim,
            num_downsample=mc.num_downsample,
            input_type=cfg.audio.input_type,
            quantize_channels=cfg.audio.quantize_channels,
            n_speakers=n_speakers if gin > 0 else 0,
            gin_channels=gin,
            num_quantizers=mc.num_quantizers,
        )
    return VQVAE(
        input_dim=mc.input_dim,
        dim=mc.dim,
        z_dim=mc.z_dim,
        n_speakers=n_speakers if gin > 0 else 0,
        gin_channels=gin,
        norm=norm,
        num_quantizers=mc.num_quantizers,
        dtype=dtype,
    )


def _audio_loaders(args, cfg):
    loaders = get_audio_data_loaders(
        args.datadir,
        args.speaker_id,
        args.batch_size,
        cfg,
        test_shuffle=True,
        batch_mode="wave" if args.model == "wavevqvae" else "mel",
        # two-level hierarchy downsamples time by 8, so crops/buckets
        # must be divisible by 8 for the top decoder to re-align
        latent_stride=8 if args.model == "hiervqvae" else 4,
    )
    return loaders["train"], loaders["test"]


def _image_loaders(args):
    load = load_mnist if args.dataset == "MNIST" else load_cifar10
    train_x, train_y = load(args.datadir, train=True)
    test_x, test_y = load(args.datadir, train=False)

    def train_iter(epoch):
        return image_batches(train_x, train_y, args.batch_size, seed=epoch)

    def test_iter():
        return image_batches(test_x, test_y, args.batch_size, seed=0, shuffle=False)

    return train_iter, test_iter


def dump_reconstruction(args, cfg, recon, epoch):
    """Per-epoch artifact dump (main.py:137-220): reconstruction .npy, and
    for audio datasets a Griffin-Lim inversion .wav of the last batch
    element (the reference inverts only the last element, main.py:183)."""
    sample_dir = os.path.join(args.sampledir, args.dataset)
    os.makedirs(sample_dir, exist_ok=True)
    recon_np = np.asarray(recon)[..., 0] if recon.ndim == 4 else np.asarray(recon)
    tag = (
        f"{args.model}_data_{args.dataset}_dim_{args.dim}"
        f"_z_dim_{args.z_dim}_epoch_{epoch}"
    )
    np.save(os.path.join(sample_dir, f"reconstruction_{tag}.npy"), recon_np)
    if args.model == "wavevqvae":
        # branch on the CONFIGURED output head, not ndim: scalar-input
        # reconstructions are (B, S, 1) — also ndim 3 — and an argmax
        # over the size-1 axis wrote a constant waveform artifact
        if cfg.audio.is_mulaw_quantize:  # categorical logits -> argmax
            from neural_sound_generation_tpu.ops.dsp import inv_mulaw_quantize

            wav_out = np.asarray(
                inv_mulaw_quantize(
                    jnp.asarray(recon_np[-1].argmax(-1)), cfg.audio.quantize_channels
                )
            )
        else:
            wav_out = np.asarray(recon_np[-1]).reshape(-1)
            if cfg.audio.is_mulaw:
                wav_out = np.asarray(
                    dsp.inv_mulaw(
                        jnp.asarray(wav_out), cfg.audio.quantize_channels
                    )
                )
        dsp.save_wav(
            wav_out,
            os.path.join(sample_dir, f"audio_recon_{tag}.wav"),
            cfg.audio.sample_rate,
        )
        return
    if args.dataset in ("ljspeech", "cmu_arctic", "jsut", "librivox"):
        mel = jnp.asarray(recon_np[-1])  # (n_mels, frames)
        wav = dsp.inv_mel_spectrogram(mel, cfg.audio, jax.random.PRNGKey(epoch))
        dsp.save_wav(
            np.asarray(wav),
            os.path.join(
                sample_dir,
                f"audio_recon_{tag}_fftsize_{cfg.audio.fft_size}"
                f"_hopsize_{cfg.audio.effective_hop_size}.wav",
            ),
            cfg.audio.sample_rate,
        )


def _apply_data_codebook_init(model, variables, x, key):
    """--codebook-init data: replace the fresh codebook(s) with rows
    drawn from the warmup batch's encoder outputs
    (ops/vq.data_codebook_init). Runs BEFORE create_train_state so the
    EMA-codebook shadow (when enabled) copies the seeded rows."""
    from neural_sound_generation_tpu.models import (
        HierVQVAE, VQVAE, WaveVQVAE,
    )
    from neural_sound_generation_tpu.ops.vq import data_codebook_init

    def replace(vs, name, z_e, seed):
        old = vs["params"][name]
        new = data_codebook_init(
            z_e, old.shape, jax.random.fold_in(key, seed)
        ).astype(old.dtype)
        vs = dict(vs)
        vs["params"] = dict(vs["params"])
        vs["params"][name] = new
        print(f"{name} seeded from encoder outputs ({old.shape})")
        return vs

    def warm_apply(vs, method):
        # TRAIN-mode encode (batch statistics, mutation discarded):
        # training quantizes train-mode batch-normalized z_e, while
        # eval mode at init is an identity BN pass (running mean 0 /
        # var 1) — seeding from the latter can land the rows off the
        # distribution training actually quantizes (review finding)
        out, _ = model.apply(
            vs, x, True, method=method, mutable=["batch_stats"]
        )
        return out

    if isinstance(model, HierVQVAE):
        # two passes: the bottom encoder path consumes the DECODED top
        # codes, so seed the top codebook first and recompute the
        # bottom z_e under it
        def levels(m, xx, train):
            top, bot = m._levels(xx, train)
            return top[1], bot[1]  # (z_e_top, z_e_bottom)

        z_e_t, _ = warm_apply(variables, levels)
        variables = replace(variables, "codebook_top", z_e_t, 1)
        _, z_e_b = warm_apply(variables, levels)
        return replace(variables, "codebook_bottom", z_e_b, 2)
    if not isinstance(model, (VQVAE, WaveVQVAE)):
        raise SystemExit(
            "--codebook-init data supports the vqvae/wavevqvae/"
            "hiervqvae families"
        )
    if isinstance(model, WaveVQVAE):
        z_e = warm_apply(
            variables,
            lambda m, xx, train: m.encoder(m._embed_input(xx), train),
        )
    else:
        z_e = warm_apply(
            variables, lambda m, xx, train: m.encoder(xx, train)
        )
    return replace(variables, "codebook", z_e, 1)


def main(argv=None):
    from neural_sound_generation_tpu.utils.compilation_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    args = parse_args(argv)
    cfg = build_config(args)
    key = jax.random.PRNGKey(args.seed)

    audio_mode = args.dataset not in ("MNIST", "CIFAR10")
    if audio_mode:
        train_loader, test_loader = _audio_loaders(args, cfg)
        sample_batch = next(iter(test_loader))
        n_speakers = cfg.arch.n_speakers if "g" in sample_batch else 0
    else:
        train_iter, test_iter = _image_loaders(args)
        sample_batch = next(test_iter())
        n_speakers = 0

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = make_model(cfg, n_speakers, norm=args.norm, dtype=dtype)
    # hiervqvae has no speaker-conditioning entry point (train it per
    # speaker or unconditioned); other families accept g
    init_kwargs = (
        {"g": sample_batch["g"]}
        if "g" in sample_batch and args.model != "hiervqvae"
        else {}
    )
    variables = model.init(
        key, jnp.asarray(sample_batch["x"]), train=False, **init_kwargs
    )
    if getattr(args, "codebook_init", "uniform") == "data":
        # seed from a TRAIN batch — sample_batch is test-split and a
        # test-seeded codebook would leak held-out data into init
        # (round-5 review finding), biasing every eval metric
        warm = (
            next(iter(train_loader)) if audio_mode else next(train_iter(0))
        )
        variables = _apply_data_codebook_init(
            model, variables, jnp.asarray(warm["x"]), key
        )
    # tensor parallelism (--mesh-model N > 1) needs per-leaf optimizer
    # moments so they can mirror the 'model'-axis param shardings; the
    # flat fused optimizer is the pure-dp fast path (train_state.py)
    tensor_parallel = args.mesh_model > 1
    state = create_train_state(
        variables, cfg.train, ema_codebook=cfg.model.ema_codebook,
        fused=False if tensor_parallel else None,
    )

    mesh, _ = mesh_from_args(args.mesh_data, args.mesh_model, args.batch_size)

    ckpt_dir = _checkpoint_dir(args)
    start_epoch = 1
    if args.resume and checkpoint.latest_step(ckpt_dir) is not None:
        # tx is a static (non-pytree) field: restore keeps the template's
        # optimizer — built above with the SAME ema/fused flags, so no
        # rebuild (a second create_train_state allocated throwaway
        # moments and silently dropped those flags)
        state, extra = checkpoint.restore(ckpt_dir, state)
        start_epoch = int((extra or {}).get("epoch", 0)) + 1
        print(f"Resumed from step {int(np.asarray(state.step))}, epoch {start_epoch}")

    metrics_path = os.path.join(
        args.sampledir, args.dataset, "metrics.jsonl"
    )
    os.makedirs(os.path.dirname(metrics_path), exist_ok=True)
    trainer = Trainer(model, cfg, state, mesh=mesh, metrics_path=metrics_path,
                      multi_steps=args.multi_steps,
                      tensor_parallel=tensor_parallel)
    print(model)

    last_epoch = start_epoch - 1

    def save(epoch, block=False):
        # per-epoch saves overlap the next epoch's compute (the loop
        # pays only the device->host pull; the Orbax write threads);
        # the final save blocks so exit never races an in-flight write
        checkpoint.save(
            ckpt_dir,
            trainer.state,
            step=int(np.asarray(jax.device_get(trainer.state.step))),
            extra={"epoch": epoch, "arch": args.model,
                   "num_quantizers": cfg.model.num_quantizers,
                   "num_downsample": cfg.model.num_downsample},
            block=block,
        )

    def limit(it):
        if args.max_batches_per_epoch is None:
            return it
        import itertools

        return itertools.islice(it, args.max_batches_per_epoch)

    def interval_ckpt(epoch):
        # cfg.train.checkpoint_interval-step saves inside long epochs —
        # the reference configures this interval (hparams.py:122) but
        # never consumes it; async so the loop keeps training.
        # Stored epoch is the last COMPLETED one (epoch - 1): --resume
        # computes start_epoch = stored + 1, so a run preempted
        # mid-epoch replays the interrupted epoch with its pinned
        # shuffle order instead of silently skipping its remainder.
        def cb(state, step):
            checkpoint.save(
                ckpt_dir, state, step=int(step),
                extra={"epoch": epoch - 1, "arch": args.model,
                       "num_quantizers": cfg.model.num_quantizers,
                       "num_downsample": cfg.model.num_downsample},
                block=False,
            )
        return cb

    try:
        for epoch in range(start_epoch, args.epochs + 1):
            # epoch-derived (not a sequential split chain, which would
            # restart at --resume): epoch N's key is the same whether or
            # not the run was interrupted
            ek = jax.random.fold_in(key, epoch)
            if audio_mode:
                # data order is f(seed, epoch): a resumed run sees the
                # batches an uninterrupted run's epoch-N pass would
                train_loader.set_epoch(epoch - 1)
                batches = limit(iter(train_loader))
            else:
                batches = limit(train_iter(epoch))
            trainer.train_epoch(batches, ek, epoch=epoch,
                                checkpoint_cb=interval_ckpt(epoch))
            test_batches = limit(iter(test_loader)) if audio_mode else limit(
                test_iter()
            )
            _, recon = trainer.eval_epoch(test_batches)
            if recon is not None:
                print("Evaluating samples")
                dump_reconstruction(args, cfg, jax.device_get(recon), epoch)
            last_epoch = epoch
            save(epoch)
    except KeyboardInterrupt:
        print("Interrupted!")
    finally:
        save(last_epoch, block=True)


if __name__ == "__main__":
    main(sys.argv[1:])
