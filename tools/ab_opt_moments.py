"""A/B: f32 vs bf16 fused-Adam moments on the flagship train step (TPU).

Usage: tools/ab_opt_moments.py <moments: f32|bf16>
Prints one JSON line {moments, steps_per_sec, rounds}.

The fused optimizer stage is HBM-bandwidth-bound (PERF.md step
attribution: ~0.49 ms of the 2.5 ms step); bf16 moments halve its m/v
bytes. Run each leg in its own process and compare same-window medians
(tunnel variance makes cross-window comparison meaningless). The timed
region ends with host materialization of the chained loss —
block_until_ready is NOT a barrier on this backend.
"""
import dataclasses
import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import VQVAE
from neural_sound_generation_tpu.training import create_train_state
from neural_sound_generation_tpu.training.trainer import make_multistep_train


def log(m):
    print(m, file=sys.stderr, flush=True)


moments = sys.argv[1]
assert moments in ("f32", "bf16"), moments

rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)
cfg = Config().parse("batch_size=64")
cfg = dataclasses.replace(
    cfg,
    train=dataclasses.replace(cfg.train, bf16_moments=(moments == "bf16")),
)
model = VQVAE(input_dim=1, dim=256, z_dim=512, dtype=jnp.bfloat16)
x = jnp.asarray(rng.standard_normal((64, 80, 28, 1)).astype(np.float32))
batch = {"x": x}
multi = 64

variables = model.init(key, batch["x"], train=False)
state = create_train_state(variables, cfg.train)
assert state.opt_state.m.dtype == (
    jnp.bfloat16 if moments == "bf16" else jnp.float32
)
run = make_multistep_train(model, cfg, multi, donate=True)
super_batch = jax.tree_util.tree_map(
    lambda a: jnp.tile(a[None], (multi,) + (1,) * a.ndim), batch)
try:
    run = run.lower(state, super_batch, key).compile()
except Exception as e:
    log(f"AOT compile unavailable: {e!r}")

launches = 4
state, metrics = run(state, super_batch, key)
state, metrics = run(state, super_batch, key)
float(metrics["loss"][-1])
rates = []
for r in range(3):
    if r:
        time.sleep(15)
    t0 = time.perf_counter()
    for _ in range(launches):
        state, metrics = run(state, super_batch, key)
    loss = float(metrics["loss"][-1])  # host barrier inside timed region
    dt = time.perf_counter() - t0
    rates.append(launches * multi / dt)
    log(f"[moments/{moments}] round {r}: {rates[-1]:.2f} steps/s loss={loss:.4f}")
print(json.dumps({
    "moments": moments,
    "steps_per_sec": round(float(np.median(rates)), 2),
    "rounds": [round(x, 2) for x in rates],
}))
