"""Per-conv-site attribution of the flagship VQ-VAE step (round-4
verdict item 4).

Round 3 established (PERF.md "Whole-program subsystem attribution"):
the conv core carries ~99.6% of the FLOPs and runs at 57% of its MXU
roofline — forward ~34% of peak vs backward ~44% — but stopped at the
conv core as one bucket. This script splits the core BY SITE the same
whole-program way: each variant swaps ONE site for an identity of the
same output shape (keeping every other stage, the VQ machinery, norm,
loss, backward, and optimizer intact), so the delta to the full step is
that site's in-context cost. Ablations that change param shapes change
the optimizer cost too — deltas are read against the matching-params
control, and all variants run in ONE process back-to-back (same-window,
the only comparison the axon tunnel supports — PERF.md gotcha).

Sites (flagship: B=64, 80x28 mel, dim=256, z=512):
  enc_conv1   4x4/s2   1->256   @ 80x28 -> 40x14
  enc_conv2   4x4/s2 256->256   @ 40x14 -> 20x7
  enc_res     ResBlock x2       @ 20x7
  dec_res     ResBlock x2       @ 20x7
  dec_deconv1 4x4/s2T 256->256  @ 20x7  -> 40x14
  dec_deconv2 4x4/s2T 256->1    @ 40x14 -> 80x28

Prints one JSON line per variant + a summary with per-site ms and the
site's share of the conv core.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import flax.linen as nn  # noqa: E402

BATCH, MELS, FRAMES = 64, 80, 28
DIM, Z_DIM = 256, 512


def build_variant(ablate: frozenset, dim=DIM, z_dim=Z_DIM):
    """VQVAE clone with named sites replaceable by shape-preserving
    identities. Mirrors models/vqvae.py exactly (same layers module,
    same init) — only the ablation hooks are added."""
    from neural_sound_generation_tpu.models.layers import (
        ResBlock, conv_down, conv_up, conv_kernel_init, make_norm,
    )
    from neural_sound_generation_tpu.models.vqvae import VQVAE
    from neural_sound_generation_tpu.ops.vq import codebook_lookup, vq_st

    DT = jnp.bfloat16  # production compute dtype (bench.py model)

    class AblEncoder(nn.Module):
        dim: int

        @nn.compact
        def __call__(self, x, train=True):
            if "enc_conv1" in ablate:
                # same output shape (B, H/2, W/2, dim), near-zero FLOPs:
                # strided slice + broadcast of the single input channel
                h = jnp.broadcast_to(
                    x[:, ::2, ::2, :1], x[:, ::2, ::2, :1].shape[:-1]
                    + (self.dim,),
                ).astype(DT)
            else:
                h = conv_down(self.dim, dtype=DT)(x)
            h = make_norm("batch", train, DT)(h)
            h = nn.relu(h)
            if "enc_conv2" in ablate:
                h = h[:, ::2, ::2, :]
            else:
                h = conv_down(self.dim, dtype=DT)(h)
            if "enc_res" not in ablate:
                h = ResBlock(self.dim, dtype=DT)(h, train)
                h = ResBlock(self.dim, dtype=DT)(h, train)
            return h

    class AblDecoder(nn.Module):
        dim: int

        @nn.compact
        def __call__(self, z, train=True):
            h = z.astype(DT)
            if "dec_res" not in ablate:
                h = ResBlock(self.dim, dtype=DT)(h, train)
                h = ResBlock(self.dim, dtype=DT)(h, train)
            h = nn.relu(h)
            if "dec_deconv1" in ablate:
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            else:
                h = conv_up(self.dim, dtype=DT)(h)
            h = make_norm("batch", train, DT)(h)
            h = nn.relu(h)
            if "dec_deconv2" in ablate:
                # slice channels FIRST: repeating before slicing would
                # materialize a (B, 80, 28, 256) intermediate — 256x the
                # conv's own output traffic (measured: it made the
                # "identity" 0.9 ms SLOWER than the conv it replaced)
                h = h[..., :1]
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            else:
                h = conv_up(1, dtype=DT)(h)
            return nn.tanh(h.astype(jnp.float32))

    # subclass the REAL model so the trainer's isinstance dispatch (loss
    # selection, eval) treats the ablated variant as a VQVAE
    class AblVQVAE(VQVAE):
        def setup(self):
            init = nn.initializers.uniform(scale=2.0 / self.z_dim)
            self.codebook = self.param(
                "codebook",
                lambda key, shape: init(key, shape) - 1.0 / self.z_dim,
                (self.z_dim, self.dim),
            )
            self.encoder = AblEncoder(self.dim)
            self.decoder = AblDecoder(self.dim)

        def __call__(self, x, train=True, g=None):
            z_e = self.encoder(x, train).astype(jnp.float32)
            codes_st, indices = vq_st(z_e, self.codebook)
            z_q = codebook_lookup(self.codebook, indices).reshape(z_e.shape)
            x_tilde = self.decoder(codes_st, train)
            return x_tilde, z_e, z_q

    return AblVQVAE(dim=dim, z_dim=z_dim)


def time_variant(name, model, cfg, batch, n_steps, inner):
    """Build state + multi-step program for this variant, time it with a
    host-materialization barrier (float of the loss — block_until_ready
    lies through the tunnel, PERF.md)."""
    from neural_sound_generation_tpu.training import create_train_state
    from neural_sound_generation_tpu.training.trainer import (
        make_multistep_train, stack_batches,
    )

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["x"]), train=False
    )
    state = create_train_state(variables, cfg.train)
    run = make_multistep_train(model, cfg, inner, donate=False)
    # device-resident super-batch: re-uploading 36 MB through the axon
    # tunnel per launch would swamp the 2-3 ms step being measured
    super_batch = jax.device_put(stack_batches([batch] * inner))
    key = jax.random.PRNGKey(1)

    state2, m = run(state, super_batch, key)  # compile + warm
    _ = float(np.asarray(jax.device_get(m["loss"]))[-1])
    t0 = time.perf_counter()
    launches = max(1, n_steps // inner)
    for i in range(launches):
        state2, m = run(state2, super_batch, jax.random.fold_in(key, i))
    last = float(np.asarray(jax.device_get(m["loss"]))[-1])
    dt = time.perf_counter() - t0
    ms = dt / (launches * inner) * 1e3
    n_params = sum(
        int(np.prod(p.shape))
        for p in jax.tree_util.tree_leaves(variables["params"])
    )
    rec = {"variant": name, "ms_per_step": round(ms, 4),
           "steps_per_s": round(1e3 / ms, 1), "params": n_params,
           "loss": round(last, 4)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=512)
    ap.add_argument("--inner", type=int, default=64)
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    if args.quick:
        args.steps, args.inner = 16, 8

    from neural_sound_generation_tpu.config import Config

    cfg = Config().parse(f"batch_size={BATCH}")
    rng = np.random.default_rng(0)
    batch = {
        "x": rng.standard_normal((BATCH, MELS, FRAMES, 1)).astype(np.float32)
    }
    print(json.dumps({"env": str(jax.devices()[0]),
                      "backend": jax.default_backend()}), flush=True)

    sites = ["enc_conv1", "enc_conv2", "enc_res", "dec_res",
             "dec_deconv1", "dec_deconv2"]
    results = {}
    # full control first, then each single-site ablation, then the
    # empty-core sanity floor — all in one process, back to back
    results["full"] = time_variant(
        "full", build_variant(frozenset()), cfg, batch, args.steps,
        args.inner,
    )
    for s in sites:
        results[s] = time_variant(
            f"no_{s}", build_variant(frozenset([s])), cfg, batch,
            args.steps, args.inner,
        )
    results["none"] = time_variant(
        "no_all_convs", build_variant(frozenset(sites)), cfg, batch,
        args.steps, args.inner,
    )

    # non-conv levers, same whole-program way: the optimizer/EMA stage
    # is config-reachable — EMA off and bf16 moments bound how much of
    # the step the update machinery costs
    import dataclasses

    cfg_noema = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, exponential_moving_average=False))
    results["no_ema"] = time_variant(
        "full_ema_off", build_variant(frozenset()), cfg_noema, batch,
        args.steps, args.inner,
    )
    cfg_bf16m = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16_moments=True))
    results["bf16_moments"] = time_variant(
        "full_bf16_moments", build_variant(frozenset()), cfg_bf16m,
        batch, args.steps, args.inner,
    )

    full_ms = results["full"]["ms_per_step"]
    floor_ms = results["none"]["ms_per_step"]
    per_site = {
        s: round(full_ms - results[s]["ms_per_step"], 4) for s in sites
    }
    print(json.dumps({
        "summary": {
            "full_ms": full_ms,
            "non_conv_floor_ms": floor_ms,
            "per_site_ms": per_site,
            "sites_sum_ms": round(sum(per_site.values()), 4),
            "conv_core_ms_implied": round(full_ms - floor_ms, 4),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
