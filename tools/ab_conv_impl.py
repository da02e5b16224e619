"""A/B: phase-decomposed vs stock stride convs, per family, on the TPU.

Usage: tools/ab_conv_impl.py <family: vqvae|wavevqvae|vocoder> \
                             <impl: phased|stock|edge>
Prints one JSON line {family, impl, steps_per_sec, rounds}. ``edge``
decomposes only the tiny-channel stem/head convs (models/layers.py
_use_phased).

Run each impl in its OWN process (NSG_CONV_IMPL is read at trace time)
and compare same-window medians; tunnel variance makes cross-window
comparison meaningless (PERF.md methodology notes). The timed region
ends with host materialization of the chained loss — block_until_ready
is NOT a barrier on this backend.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

family, impl = sys.argv[1], sys.argv[2]
assert impl in ("phased", "stock", "edge"), impl
os.environ["NSG_CONV_IMPL"] = impl  # read at trace time by models.layers

import numpy as np
import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.utils.compilation_cache import (
    enable_persistent_cache,
)

enable_persistent_cache()  # tunnel compiles can take minutes; cache them

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.training import create_train_state
from neural_sound_generation_tpu.training.trainer import make_multistep_train


def log(m):
    print(m, file=sys.stderr, flush=True)


rng = np.random.default_rng(0)
key = jax.random.PRNGKey(0)

if family == "vqvae":
    from neural_sound_generation_tpu.models import VQVAE
    cfg = Config().parse("batch_size=64")
    model = VQVAE(input_dim=1, dim=256, z_dim=512, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((64, 80, 28, 1)).astype(np.float32))
    batch = {"x": x}
    multi = 64
elif family == "wavevqvae":
    from neural_sound_generation_tpu.models import WaveVQVAE
    cfg = Config().parse("batch_size=16")
    model = WaveVQVAE(dim=256, z_dim=512, num_downsample=6)
    x = jnp.asarray(rng.standard_normal((16, 7680, 1)).astype(np.float32))
    batch = {"x": x}
    multi = 16
elif family == "vocoder":
    from neural_sound_generation_tpu.models import WaveNet
    cfg = Config().parse("batch_size=4")
    model = WaveNet(out_channels=30, layers=24, stacks=4,
                    residual_channels=128, gate_channels=256,
                    skip_out_channels=128, cin_channels=80)
    y = jnp.asarray(rng.standard_normal((4, 7680, 1)).astype(np.float32))
    c = jnp.asarray(rng.standard_normal((4, 30, 80)).astype(np.float32))
    batch = {"y": y, "c": c}
    multi = 8
else:
    raise SystemExit(f"unknown family {family}")

init_args = ()
if family == "vocoder":
    variables = model.init(key, jnp.zeros_like(y), c, None)
else:
    variables = model.init(key, batch["x"], train=False)
state = create_train_state(variables, cfg.train)
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
    log(f"[{family}/{impl}] round {r}: {rates[-1]:.2f} steps/s loss={loss:.4f}")
print(json.dumps({
    "family": family, "impl": impl,
    "steps_per_sec": round(float(np.median(rates)), 2),
    "rounds": [round(x, 2) for x in rates],
}))
