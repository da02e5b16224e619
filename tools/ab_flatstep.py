"""A/B/C: tree-carry vs flat-carry vs flat-native multi-step training.

The fused optimizer (training/train_state.py) ravels the grad tree and
the param tree to flat vectors EVERY step and unravels the updated
params back — ~4 full-parameter copies (~100-150 MB/step at the
flagship size) on top of the optimizer's irreducible read/write
traffic. Three arms:

- tree:  the pre-round-3 production multi-step — TrainState rides the
         scan as a tree, ravel/unravel inside every inner step.
- base:  the production `make_multistep_train` path (now the flat
         carry: params/moments/EMA scan as flat f32 vectors, one
         ravel/unravel per LAUNCH).
- flat:  a minimal hand-rolled flat-native loop (no grad-norm metric,
         no clip/wd branches) — the ceiling for this rewrite.

Usage: tools/ab_flatstep.py [steps] [multi]
Prints one JSON line: {tree_sps, baseline_sps, flat_sps, speedup,
loss_delta} where speedup = base/tree. Methodology per PERF.md:
interleaved same-window rounds, host materialization as the barrier.
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.flatten_util import ravel_pytree

from neural_sound_generation_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import VQVAE
from neural_sound_generation_tpu.training import create_train_state
from neural_sound_generation_tpu.training.trainer import (
    _vqvae_loss_fn,
    make_multistep_train,
)

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 320
MULTI = int(sys.argv[2]) if len(sys.argv) > 2 else 64
BATCH, MELS, FRAMES, DIM, Z_DIM = 64, 80, 28, 256, 512
B1, B2, EPS, LR, EMA_D = 0.9, 0.999, 1e-8, 1e-3, 0.9999


def log(m):
    print(m, file=sys.stderr, flush=True)


cfg = Config().parse(f"batch_size={BATCH}")
model = VQVAE(input_dim=1, dim=DIM, z_dim=Z_DIM, dtype=jnp.bfloat16)
x = jnp.asarray(
    np.random.default_rng(0)
    .standard_normal((BATCH, MELS, FRAMES, 1))
    .astype(np.float32)
)
variables = model.init(jax.random.PRNGKey(0), x, train=False)
key = jax.random.PRNGKey(0)
super_batch = {"x": jnp.tile(x[None], (MULTI, 1, 1, 1, 1))}
loss_fn = _vqvae_loss_fn(model, cfg.model.beta)

# ---- baseline: the production multi-step path (flat carry)
state = create_train_state(variables, cfg.train)
run_base = make_multistep_train(model, cfg, MULTI, donate=True)

# ---- tree-carry: the pre-round-3 production path — TrainState scans
# as a tree, per-step ravel/unravel inside _apply_gradients_fused
from neural_sound_generation_tpu.training.trainer import make_train_step

_inner = make_train_step(model, cfg, donate=False).__wrapped__


def _multi_tree(state, batches, rng):
    def body(carry, batch):
        st, r = carry
        r, sub = jax.random.split(r)
        st, metrics = _inner(st, batch, sub)
        return (st, r), metrics

    (state, _), metrics = lax.scan(body, (state, rng), batches)
    return state, metrics


run_tree = jax.jit(_multi_tree, donate_argnums=(0,))
state_tree = create_train_state(
    jax.tree_util.tree_map(jnp.array, variables), cfg.train
)

# ---- flat-native: params live as ONE f32 vector across steps
flat0, unravel = ravel_pytree(variables["params"])
# deep-copy: the baseline donates `state`, whose leaves alias `variables`
bs0 = jax.tree_util.tree_map(
    lambda a: jnp.array(a), variables.get("batch_stats", {}))


def flat_loss(flat, bs, batch, rng):
    return loss_fn(unravel(flat), bs, batch, rng)


def one_step(carry, batch):
    flat, bs, m, v, ema, count = carry
    (_, (metrics, new_bs, _)), g = jax.value_and_grad(
        flat_loss, has_aux=True
    )(flat, bs, batch, key)
    count = count + 1
    m = B1 * m + (1.0 - B1) * g
    v = B2 * v + (1.0 - B2) * g * g
    cf = count.astype(jnp.float32)
    m_hat = m / (1.0 - B1**cf)
    v_hat = v / (1.0 - B2**cf)
    flat = flat - LR * m_hat / (jnp.sqrt(v_hat) + EPS)
    ema = EMA_D * ema + (1.0 - EMA_D) * flat
    return (flat, new_bs, m, v, ema, count), {"loss": metrics["loss"]}


@functools.partial(jax.jit, donate_argnums=(0,))
def run_flat(carry, batches):
    return lax.scan(one_step, carry, batches)


# the EMA slot must be a DISTINCT buffer: the carry is donated, and two
# donated inputs must not alias one array
carry = (flat0, bs0, jnp.zeros_like(flat0), jnp.zeros_like(flat0),
         jnp.array(flat0), jnp.zeros((), jnp.int32))

# compile all three
state, mb = run_base(state, super_batch, key)
state_tree, mt = run_tree(state_tree, super_batch, key)
carry, mf = run_flat(carry, super_batch)
log(f"[ab_flatstep] compiled; first-window losses "
    f"tree={float(mt['loss'][-1]):.5f} base={float(mb['loss'][-1]):.5f} "
    f"flat={float(mf['loss'][-1]):.5f}")

launches = max(1, STEPS // MULTI)
rates = {"tree": [], "base": [], "flat": []}
for r in range(3):
    t0 = time.perf_counter()
    for _ in range(launches):
        state_tree, mt = run_tree(state_tree, super_batch, key)
    lt = float(mt["loss"][-1])
    rates["tree"].append(launches * MULTI / (time.perf_counter() - t0))
    t0 = time.perf_counter()
    for _ in range(launches):
        state, mb = run_base(state, super_batch, key)
    lb = float(mb["loss"][-1])
    rates["base"].append(launches * MULTI / (time.perf_counter() - t0))
    t0 = time.perf_counter()
    for _ in range(launches):
        carry, mf = run_flat(carry, super_batch)
    lf = float(mf["loss"][-1])
    rates["flat"].append(launches * MULTI / (time.perf_counter() - t0))
    log(f"[ab_flatstep] round {r}: tree {rates['tree'][-1]:.1f} "
        f"base {rates['base'][-1]:.1f} flat {rates['flat'][-1]:.1f} "
        f"steps/s (loss tree {lt:.5f} base {lb:.5f} flat {lf:.5f})")

tree = float(np.median(rates["tree"]))
base = float(np.median(rates["base"]))
flat = float(np.median(rates["flat"]))
print(json.dumps({
    "tree_sps": round(tree, 1),
    "baseline_sps": round(base, 1), "flat_sps": round(flat, 1),
    "speedup": round(base / tree, 3),
    "loss_delta": round(abs(lb - lt), 6),
}))
