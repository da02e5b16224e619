"""Hierarchical generative chain soak — end-to-end sampling at depth.

The hier stack is the framework's quality-differentiating model (PERF.md
"Hierarchical vs flat": -24% held-out recon), but until round 5 its
SAMPLING path — top prior -> conditioned bottom prior -> two-level
decode -> audio — had only toy-size test coverage. This runs the chain
on real hardware at the flagship-size hierarchy (dim 256, K=512/level)
through the production surfaces:

  corpus -> cli.preprocess -> cli.main --model hiervqvae (+ a flat
  VQVAE of the same size for the recon comparison) -> cli.prior train
  --hier top (transformer) + bottom (pixelcnn — the measured long-T
  steer, cli/prior.py long_t_warning) -> sampling BOTH via the
  inference API (codes-used-per-level + wall time) and via
  `cli.prior sample --hier` (the product path) -> a live HTTP server
  (`serve --model hiervqvae --prior-ckpt --bottom-ckpt` machinery)
  answering /sample, with latency percentiles.

Plus the round-5 streaming item: a flat prior + WaveNet vocoder server
measuring /sample_stream TTFB + sustained PCM rate against the buffered
/sample on the same chain.

One JSON line per phase; "summary" is what PERF.md records. --quick
shrinks everything for a CPU smoke (tests/test_cli.py pins the CLI
pieces separately).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/nsg-hier-soak")
    ap.add_argument("--n-utts", type=int, default=48)
    ap.add_argument("--seconds", type=float, default=2.0)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--z-dim", type=int, default=512)
    ap.add_argument("--vq-epochs", type=int, default=12)
    ap.add_argument("--prior-epochs", type=int, default=4)
    ap.add_argument("--wn-epochs", type=int, default=2)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)
    if args.quick:
        args.n_utts, args.seconds = 6, 0.6
        args.dim, args.z_dim = 8, 16
        args.vq_epochs = args.prior_epochs = args.wn_epochs = 1
        args.batch_size = 2

    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.cli import main as train_cli
    from neural_sound_generation_tpu.cli import preprocess as preprocess_cli
    from neural_sound_generation_tpu.cli import prior as prior_cli
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.data import get_audio_data_loaders
    from neural_sound_generation_tpu.models import (
        VQVAE, GatedPixelCNN, HierVQVAE, TransformerPrior,
    )
    from neural_sound_generation_tpu.training import (
        checkpoint, create_train_state,
    )

    wd = args.workdir
    os.makedirs(wd, exist_ok=True)

    def emit(phase, **kw):
        print(json.dumps({"phase": phase, **kw}), flush=True)

    emit("env", backend=jax.default_backend(), device=str(jax.devices()[0]))

    # corpus + preprocess (reference default chain: raw, 22050);
    # same generator as the wave soak (scripts/ is not a package)
    import importlib.util as _ilu

    _spec = _ilu.spec_from_file_location(
        "wave_soak", os.path.join(REPO, "scripts", "wave_soak.py")
    )
    _ws = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_ws)
    make_lj_corpus = _ws.make_lj_corpus

    in_dir, out_dir = os.path.join(wd, "in"), os.path.join(wd, "out")
    t0 = time.time()
    make_lj_corpus(in_dir, args.n_utts, args.seconds)
    preprocess_cli.main(["ljspeech", in_dir, out_dir])
    emit("preprocess", utterances=args.n_utts, secs=round(time.time() - t0, 1))

    # hier + flat autoencoders of the same size
    def train_ae(model_name, ckpt_root):
        train_cli.main([
            "--model", model_name, "--dataset", "ljspeech",
            "--datadir", out_dir,
            "--sampledir", os.path.join(wd, "results"),
            "--ckpt-dir", ckpt_root,
            "--batch-size", str(args.batch_size),
            "--epochs", str(args.vq_epochs),
            "--dim", str(args.dim), "--z-dim", str(args.z_dim),
            "--multi-steps", "1" if args.quick else "4",
        ])
        return os.path.join(
            ckpt_root, model_name,
            f"checkpoint_ljspeech_{args.dim}_{args.z_dim}",
        )

    t0 = time.time()
    hier_ckpt = train_ae("hiervqvae", os.path.join(wd, "models_h"))
    flat_ckpt = train_ae("vqvae", os.path.join(wd, "models_f"))
    emit("ae_train", epochs=args.vq_epochs, secs=round(time.time() - t0, 1))

    # held-out recon: hier vs flat (mel-domain MSE, same crops)
    cfg = Config()

    def heldout_recon(model, ckpt, stride):
        loaders = get_audio_data_loaders(
            out_dir, None, args.batch_size, cfg, test_shuffle=False,
            latent_stride=stride,
        )
        sample = next(iter(loaders["test"]))
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(sample["x"]), train=False
        )
        state = create_train_state(variables, cfg.train)
        state, _ = checkpoint.restore(ckpt, state)
        ev = jax.device_put(
            {"params": state.params, "batch_stats": state.batch_stats}
        )

        @jax.jit
        def mse(x):
            x_tilde = model.apply(ev, x, train=False)[0]
            return jnp.mean((x_tilde - x) ** 2, axis=(1, 2, 3))

        out = []
        for batch in loaders["test"]:
            out.extend(np.asarray(mse(jnp.asarray(batch["x"]))).tolist())
        return float(np.mean(out))

    hier_model = HierVQVAE(input_dim=1, dim=args.dim, z_dim=args.z_dim)
    flat_model = VQVAE(input_dim=1, dim=args.dim, z_dim=args.z_dim)
    mse_h = heldout_recon(hier_model, hier_ckpt, 8)
    mse_f = heldout_recon(flat_model, flat_ckpt, 4)
    emit("heldout_recon", hier_mse=round(mse_h, 6), flat_mse=round(mse_f, 6),
         hier_vs_flat=round(mse_h / max(mse_f, 1e-12), 3))

    # priors: transformer on the short top grid, pixelcnn on the long
    # bottom grid (the measured long-T steer)
    pd_top = "16" if args.quick else "128"
    pl_top = "2" if args.quick else "4"
    pd_bot = "16" if args.quick else "64"
    pl_bot = "2" if args.quick else "6"
    top_ckpt = os.path.join(wd, "prior_top")
    bot_ckpt = os.path.join(wd, "prior_bottom")
    t0 = time.time()
    prior_cli.main([
        "train", "--datadir", out_dir, "--vqvae-ckpt", hier_ckpt,
        "--ckpt-dir", top_ckpt, "--hier", "--hier-level", "top",
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--arch", "transformer", "--prior-dim", pd_top,
        "--prior-layers", pl_top,
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.prior_epochs),
    ] + ([] if args.quick else ["--bf16"]))
    prior_cli.main([
        "train", "--datadir", out_dir, "--vqvae-ckpt", hier_ckpt,
        "--ckpt-dir", bot_ckpt, "--hier", "--hier-level", "bottom",
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--arch", "pixelcnn", "--prior-dim", pd_bot,
        "--prior-layers", pl_bot,
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.prior_epochs),
    ])
    emit("prior_train", secs=round(time.time() - t0, 1))

    # ---- the chain, via the inference API: codes-used-per-level + time
    from neural_sound_generation_tpu.inference import sample_hier_audio

    n_samp = 2 if args.quick else 8
    h_top = cfg.audio.num_mels // 8          # 10
    w_top = 10 if not args.quick else 2
    top = TransformerPrior(
        input_dim=args.z_dim, dim=int(pd_top), n_layers=int(pl_top),
        n_heads=max(1, int(pd_top) // 64), n_classes=10,
    )
    bottom = GatedPixelCNN(
        input_dim=args.z_dim, dim=int(pd_bot), n_layers=int(pl_bot),
        n_classes=10, spatial_cond=True,
    )
    lab0 = jnp.zeros((1,), jnp.int32)
    tv = top.init(jax.random.PRNGKey(0),
                  jnp.zeros((1, h_top, w_top), jnp.int32), lab0)
    bv = bottom.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 2 * h_top, 2 * w_top), jnp.int32), lab0,
        jnp.zeros((1, 2 * h_top, 2 * w_top, args.dim)),
    )
    tv, _ = checkpoint.restore(top_ckpt, tv)
    bv, _ = checkpoint.restore(bot_ckpt, bv)
    sample_x = jnp.zeros((1, h_top * 8, w_top * 8, 1))
    hv = hier_model.init(jax.random.PRNGKey(0), sample_x, train=False)
    hstate = create_train_state(hv, cfg.train)
    hstate, _ = checkpoint.restore(hier_ckpt, hstate)
    hvars = jax.device_put(
        {"params": hstate.params, "batch_stats": hstate.batch_stats}
    )
    tv, bv = jax.device_put((tv, bv))
    labels = jnp.zeros((n_samp,), jnp.int32)

    # warm (compile), then measure
    idx_t, idx_b, wavs = sample_hier_audio(
        hier_model, hvars, top, tv, bottom, bv, labels, (h_top, w_top),
        cfg.audio, jax.random.PRNGKey(0),
    )
    t0 = time.time()
    idx_t, idx_b, wavs = sample_hier_audio(
        hier_model, hvars, top, tv, bottom, bv, labels, (h_top, w_top),
        cfg.audio, jax.random.PRNGKey(1),
    )
    wavs = np.asarray(wavs)
    dt = time.time() - t0
    sampling_per = dt / n_samp
    used_top = len(np.unique(np.asarray(idx_t)))
    used_bot = len(np.unique(np.asarray(idx_b)))
    emit("hier_sampling",
         n=n_samp, secs=round(dt, 2),
         secs_per_sample=round(sampling_per, 2),
         audio_seconds_per_sample=round(
             wavs.shape[1] / cfg.audio.sample_rate, 2),
         codes_used_top=used_top, codes_used_bottom=used_bot,
         z_dim=args.z_dim,
         wav_rms=round(float(np.sqrt(np.mean(wavs**2))), 4))

    # ---- the product path: cli.prior sample --hier writes wavs
    t0 = time.time()
    # mixed-architecture chain: transformer top, pixelcnn bottom — the
    # --bottom-* overrides keep each level's template matching its
    # checkpoint (a single-arch template would silently graft fresh-init
    # weights into the mismatched level; round-5 review finding)
    prior_cli.main([
        "sample", "--vqvae-ckpt", hier_ckpt, "--prior-ckpt", top_ckpt,
        "--bottom-ckpt", bot_ckpt, "--hier",
        "--output-dir", os.path.join(wd, "hier_samples"),
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--arch", "transformer", "--prior-dim", pd_top,
        "--prior-layers", pl_top,
        "--bottom-arch", "pixelcnn", "--bottom-dim", pd_bot,
        "--bottom-layers", pl_bot,
        "--code-shape", str(h_top), str(w_top), "--num-samples", "2",
    ])
    n_wavs = len(os.listdir(os.path.join(wd, "hier_samples")))
    emit("hier_cli_sample", wavs=n_wavs, secs=round(time.time() - t0, 1))

    # ---- serve the hier chain: /sample latency over live HTTP.
    # NOTE: the CLI sample above used --arch pixelcnn for BOTH levels'
    # template; serve's attach_prior takes the modules we restored
    import urllib.request

    from http.server import ThreadingHTTPServer

    from neural_sound_generation_tpu.cli.serve import (
        InferenceService, make_handler,
    )

    service = InferenceService(cfg, hier_model, hvars, frames=w_top * 8)
    service.attach_prior(top, tv, bottom, bv)
    httpd = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service))
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"

    def post(path, payload):
        req = urllib.request.Request(
            url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read()
        return time.time() - t0, body

    post("/sample", {"n": 1, "seed": 0})          # warm/compile
    lats = []
    for s in range(3 if args.quick else 6):
        dt, body = post("/sample", {"n": 1, "seed": s + 1})
        lats.append(dt)
        assert len(body) > 1000
    emit("serve_hier_sample",
         median_s=round(float(np.median(lats)), 3),
         p90_s=round(float(np.percentile(lats, 90)), 3),
         n_requests=len(lats))
    httpd.shutdown()

    # ---- round-5 streaming item: /sample_stream TTFB + sustained PCM
    # rate vs the buffered /sample, on a flat prior + WaveNet server
    # (the generative chain's longest serving path)
    from neural_sound_generation_tpu.cli import vocoder as vocoder_cli
    from neural_sound_generation_tpu.models import WaveNet

    wn_layers = "2" if args.quick else "12"
    wn_stacks = "1" if args.quick else "2"
    wn_res = "8" if args.quick else "64"
    wn_ckpt = os.path.join(wd, "wavenet")
    t0 = time.time()
    vocoder_cli.main([
        "train", "--datadir", out_dir, "--ckpt-dir", wn_ckpt,
        "--batch-size", "2", "--epochs", str(args.wn_epochs),
        "--layers", wn_layers, "--stacks", wn_stacks,
        "--residual-channels", wn_res,
    ])
    flat_prior_ckpt = os.path.join(wd, "prior_flat")
    prior_cli.main([
        "train", "--datadir", out_dir, "--vqvae-ckpt", flat_ckpt,
        "--ckpt-dir", flat_prior_ckpt,
        "--dim", str(args.dim), "--z-dim", str(args.z_dim),
        "--arch", "transformer", "--prior-dim", pd_top,
        "--prior-layers", pl_top,
        "--batch-size", str(args.batch_size),
        "--epochs", str(args.prior_epochs),
    ])
    emit("stream_prereq_train", secs=round(time.time() - t0, 1))

    fstate = create_train_state(
        flat_model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, w_top * 8, 1)), train=False),
        cfg.train,
    )
    fstate, _ = checkpoint.restore(flat_ckpt, fstate)
    fvars = jax.device_put(
        {"params": fstate.params, "batch_stats": fstate.batch_stats}
    )
    wn = WaveNet(
        out_channels=30, layers=int(wn_layers), stacks=int(wn_stacks),
        residual_channels=int(wn_res), gate_channels=int(wn_res),
        skip_out_channels=min(256, int(wn_res)),
        cin_channels=cfg.audio.num_mels,
        upsample_scales=tuple(cfg.arch.upsample_scales),
        scalar_input=cfg.audio.is_scalar_input,
    )
    x0 = WaveNet.shift_inputs(jnp.zeros((1, 8, 1)), True)
    c0 = jnp.zeros((1, 2, cfg.audio.num_mels))
    wn_template = wn.init(jax.random.PRNGKey(0), x0, c0)
    wn_vars, _ = checkpoint.restore(wn_ckpt, wn_template)
    wn_vars = jax.device_put(wn_vars)

    fprior = TransformerPrior(
        input_dim=args.z_dim, dim=int(pd_top), n_layers=int(pl_top),
        n_heads=max(1, int(pd_top) // 64), n_classes=10,
    )
    fpv = fprior.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 80 // 4, w_top * 2), jnp.int32), lab0,
    )
    fpv, _ = checkpoint.restore(flat_prior_ckpt, fpv)
    fpv = jax.device_put(fpv)

    service2 = InferenceService(
        cfg, flat_model, fvars, frames=w_top * 8, vocoder=(wn, wn_vars)
    )
    service2.attach_prior(fprior, fpv)
    httpd2 = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(service2))
    threading.Thread(target=httpd2.serve_forever, daemon=True).start()
    url2 = f"http://127.0.0.1:{httpd2.server_address[1]}"

    def post2(path, payload):
        req = urllib.request.Request(
            url2 + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read()
        return time.time() - t0, body

    def post_stream(payload):
        req = urllib.request.Request(
            url2 + "/sample_stream", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        t0 = time.time()
        with urllib.request.urlopen(req, timeout=600) as r:
            first = r.read(8192)
            ttfb = time.time() - t0
            rest = r.read()
        total = time.time() - t0
        n_pcm = (len(first) + len(rest)) // 2
        return ttfb, total, n_pcm

    post2("/sample", {"n": 1, "seed": 0})        # warm
    post_stream({"n": 1, "seed": 0})
    buf_lats, ttfbs, rates = [], [], []
    for s in range(2 if args.quick else 5):
        dt, body = post2("/sample", {"n": 1, "seed": s + 1})
        buf_lats.append(dt)
        ttfb, total, n_pcm = post_stream({"n": 1, "seed": s + 1})
        ttfbs.append(ttfb)
        if total > ttfb:
            rates.append((n_pcm - 4096) / (total - ttfb))
    audio_s = n_pcm / cfg.audio.sample_rate
    emit("sample_stream",
         buffered_median_s=round(float(np.median(buf_lats)), 3),
         stream_ttfb_median_s=round(float(np.median(ttfbs)), 3),
         audio_seconds=round(audio_s, 2),
         sustained_pcm_per_s=(
             round(float(np.median(rates)), 0) if rates else None),
         sustained_x_realtime=(
             round(float(np.median(rates)) / cfg.audio.sample_rate, 2)
             if rates else None),
         n_requests=len(buf_lats))
    httpd2.shutdown()

    emit("summary",
         hier_vs_flat_recon=round(mse_h / max(mse_f, 1e-12), 3),
         codes_used_top=used_top, codes_used_bottom=used_bot,
         sampling_secs_per_sample=round(sampling_per, 2),
         serve_sample_median_s=round(float(np.median(lats)), 3),
         stream_ttfb_median_s=round(float(np.median(ttfbs)), 3),
         stream_buffered_median_s=round(float(np.median(buf_lats)), 3))


if __name__ == "__main__":
    main()
