"""A/B: GatedPixelCNN vs TransformerPrior on the real TPU.

Usage: tools/ab_prior.py <arch: pixelcnn|transformer> [steps] [batch]

Trains the chosen prior on an identical synthetic code corpus
(spatially-correlated K=512 grids at the flagship shape 20x28 — a
smooth latent field quantized to codebook bins, so there is real
structure to learn) and prints one JSON line:

  {arch, params, steps_per_sec, nll_first, nll_final,
   sample_ms, sample_grids_per_sec}

Run each arch in its OWN process and compare same-window numbers
(tunnel variance, PERF.md methodology). Timed regions end with host
materialization of a chained value — block_until_ready is NOT a
barrier on this backend.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.training import create_train_state
from neural_sound_generation_tpu.training.trainer import make_multistep_train

arch = sys.argv[1]
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 320
BATCH = int(sys.argv[3]) if len(sys.argv) > 3 else 32
H, W, K = 20, 28, 512
N_CLASSES = 8
MULTI = 32


def log(m):
    print(m, file=sys.stderr, flush=True)


def make_codes(rng, n):
    """Spatially-correlated code grids: a smoothed Gaussian field whose
    per-class mean shifts, quantized to K bins — learnable local and
    class-conditional structure for both priors."""
    labels = rng.integers(0, N_CLASSES, n)
    base = rng.standard_normal((n, H + 8, W + 8)).astype(np.float32)
    # separable box-blur for spatial correlation
    k = np.ones(9, np.float32) / 9.0
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "valid"), 1, base)
    base = np.apply_along_axis(lambda r: np.convolve(r, k, "valid"), 2, base)
    base = base * 6.0 + labels[:, None, None].astype(np.float32) * 0.35
    codes = np.clip(
        ((base - base.min()) / (np.ptp(base) + 1e-6) * (K - 1)).round(),
        0, K - 1,
    ).astype(np.int32)
    return codes, labels.astype(np.int32)


rng = np.random.default_rng(0)
codes_all, labels_all = make_codes(rng, 4096)

cfg = Config().parse(f"batch_size={BATCH}")

if arch == "pixelcnn":
    from neural_sound_generation_tpu.models import GatedPixelCNN
    from neural_sound_generation_tpu.models.pixelcnn import fast_generate

    model = GatedPixelCNN(input_dim=K, dim=64, n_layers=15,
                          n_classes=N_CLASSES)
    sample_fn = fast_generate
elif arch == "transformer":
    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.models.transformer_prior import generate

    model = TransformerPrior(input_dim=K, dim=128, n_layers=4, n_heads=2,
                             n_classes=N_CLASSES)
    sample_fn = generate
elif arch == "pixelcnn-bf16":
    from neural_sound_generation_tpu.models import GatedPixelCNN
    from neural_sound_generation_tpu.models.pixelcnn import fast_generate

    model = GatedPixelCNN(input_dim=K, dim=64, n_layers=15,
                          n_classes=N_CLASSES, dtype=jnp.bfloat16)
    sample_fn = fast_generate
elif arch == "transformer-bf16":
    # bf16 compute (params stay f32): the fused-attention sweep showed
    # bf16 QK^T/PV run the MXU at full rate (PERF.md head-width table)
    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.models.transformer_prior import generate

    model = TransformerPrior(input_dim=K, dim=128, n_layers=4, n_heads=2,
                             n_classes=N_CLASSES, dtype=jnp.bfloat16)
    sample_fn = generate
elif arch == "transformer-moe":
    # switch-MoE feed-forwards (--moe-experts 4): 4x the MLP parameters
    # at ~cf x the per-token MLP FLOPs; single-chip (no EP sharding
    # here — this measures the routing/dispatch overhead itself)
    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.models.transformer_prior import generate

    model = TransformerPrior(input_dim=K, dim=128, n_layers=4, n_heads=2,
                             n_classes=N_CLASSES, n_experts=4)
    sample_fn = generate
else:
    raise SystemExit(f"unknown arch {arch!r}")

c0 = jnp.asarray(codes_all[:BATCH])
l0 = jnp.asarray(labels_all[:BATCH])
variables = model.init(jax.random.PRNGKey(0), c0, l0)
params_n = sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables["params"]))
log(f"[ab_prior] {arch}: {params_n / 1e6:.2f}M params")

state = create_train_state(variables, cfg.train)
mstep = make_multistep_train(model, cfg, MULTI, donate=True)

n_batches = len(codes_all) // BATCH
key = jax.random.PRNGKey(0)


def super_batch(i):
    """MULTI consecutive batches stacked on the leading scan axis."""
    idx = [(i * MULTI + j) % n_batches for j in range(MULTI)]
    return {
        "codes": jnp.asarray(
            np.stack([codes_all[b * BATCH:(b + 1) * BATCH] for b in idx])),
        "labels": jnp.asarray(
            np.stack([labels_all[b * BATCH:(b + 1) * BATCH] for b in idx])),
    }


# warm up / compile (metrics are stacked per inner step)
state, metrics = mstep(state, super_batch(0), key)
nll_first = float(np.asarray(metrics["loss"])[-1])
log(f"[ab_prior] compile ok, first-window nll/code {nll_first:.4f}")

launches = STEPS // MULTI
t0 = time.perf_counter()
for i in range(1, launches + 1):
    state, metrics = mstep(state, super_batch(i), key)
nll_final = float(np.asarray(metrics["loss"])[-1])  # host barrier
dt = time.perf_counter() - t0
sps = launches * MULTI / dt
log(f"[ab_prior] {launches * MULTI} steps in {dt:.2f}s -> {sps:.1f} steps/s, "
    f"nll/code {nll_final:.4f}")

# sampling throughput: batch-16 flagship grids, chained keys, host
# materialization at the end; first call compiles, timed calls reuse
SB = 16
lab = jnp.asarray(labels_all[:SB])
pv = {"params": state.params}
out = sample_fn(model, pv, lab, jax.random.PRNGKey(1), shape=(H, W),
                batch_size=SB)
np.asarray(out)
t0 = time.perf_counter()
ROUNDS = 5
for r in range(ROUNDS):
    out = sample_fn(model, pv, lab, jax.random.PRNGKey(2 + r), shape=(H, W),
                    batch_size=SB)
np.asarray(out)  # host barrier
dt = time.perf_counter() - t0
sample_ms = dt / ROUNDS * 1e3
log(f"[ab_prior] sampling: {sample_ms:.1f} ms per batch-{SB} grid set "
    f"({SB * ROUNDS / dt:.1f} grids/s)")

print(json.dumps({
    "arch": arch, "params": params_n, "steps_per_sec": round(sps, 1),
    "nll_first": round(nll_first, 4), "nll_final": round(nll_final, 4),
    "sample_ms": round(sample_ms, 1),
    "sample_grids_per_sec": round(SB * ROUNDS / dt, 1),
}))
