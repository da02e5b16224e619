"""Long-horizon stability soak of the flagship train stack on the chip.

Runs the production multi-step path (make_multistep_train — the
flat-carry fused-optimizer scan) at the flagship config for N steps,
checkpointing periodically through the production orbax path, then
restores the final checkpoint in-process and steps again. Asserts every
sampled loss/grad-norm is finite and prints one JSON line:

  {"steps": N, "wall_s": ..., "steps_per_sec": ..., "loss_first": ...,
   "loss_last": ..., "resume_ok": true}

Usage: tools/soak.py [steps=100000] [multi=64] [ckpt_every_launches=200]
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
from neural_sound_generation_tpu.models import VQVAE
from neural_sound_generation_tpu.training import (
    checkpoint,
    create_train_state,
)
from neural_sound_generation_tpu.training.trainer import make_multistep_train

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
MULTI = int(sys.argv[2]) if len(sys.argv) > 2 else 64
CKPT_EVERY = int(sys.argv[3]) if len(sys.argv) > 3 else 200
BATCH, MELS, FRAMES, DIM, Z_DIM = 64, 80, 28, 256, 512
CKPT_DIR = os.environ.get("NSG_SOAK_CKPT", "/tmp/nsg_soak_ckpt")


def log(m):
    print(m, file=sys.stderr, flush=True)


cfg = Config().parse(f"batch_size={BATCH}")
import dataclasses

cfg = dataclasses.replace(
    cfg, train=dataclasses.replace(cfg.train, ema_warmup=True)
)
model = VQVAE(input_dim=1, dim=DIM, z_dim=Z_DIM, dtype=jnp.bfloat16)

# structured target: sinusoid mixture + noise so the loss has a real
# floor to converge toward (pure noise would just memorize)
g = np.random.default_rng(0)
t = np.linspace(0, 1, MELS)[None, :, None, None]
x = (
    0.5 * np.sin(2 * np.pi * 3 * t)
    + 0.25 * np.sin(2 * np.pi * 11 * t + 0.7)
    + 0.05 * g.standard_normal((BATCH, MELS, FRAMES, 1))
).astype(np.float32)
x = jnp.asarray(x)
variables = model.init(jax.random.PRNGKey(0), x, train=False)
state = create_train_state(variables, cfg.train)
run = make_multistep_train(model, cfg, MULTI, donate=True)
super_batch = {"x": jnp.tile(x[None], (MULTI, 1, 1, 1, 1))}

launches = max(1, STEPS // MULTI)
key = jax.random.PRNGKey(42)
losses, gnorms = [], []

# compile (excluded from the timed window)
state, m = run(state, super_batch, key)
losses.append(float(m["loss"][-1]))
gnorms.append(float(m["grad_norm"][-1]))
log(f"[soak] compiled; first-window loss={losses[0]:.6f}")

launches = max(2, launches)  # >=1 timed launch after the compile launch
t0 = time.perf_counter()
for i in range(1, launches):
    key = jax.random.fold_in(key, i)
    state, m = run(state, super_batch, key)
    if i % CKPT_EVERY == 0 or i == launches - 1:
        # host materialization is the honest barrier on this backend
        losses.append(float(m["loss"][-1]))
        gnorms.append(float(m["grad_norm"][-1]))
        assert np.isfinite(losses[-1]) and np.isfinite(gnorms[-1]), (
            f"non-finite at launch {i}: loss={losses[-1]} gnorm={gnorms[-1]}"
        )
        checkpoint.save(
            CKPT_DIR, jax.device_get(state), step=int(np.asarray(state.step))
        )
        log(f"[soak] launch {i}/{launches}: loss={losses[-1]:.6f} "
            f"gnorm={gnorms[-1]:.4f}")
wall = time.perf_counter() - t0
total_steps = (launches - 1) * MULTI

# resume check: restore the final checkpoint into a fresh template and
# step it (the donated state is unusable; the template path must carry)
template = create_train_state(variables, cfg.train)
restored, _extra = checkpoint.restore(CKPT_DIR, template)
rstep = int(np.asarray(restored.step))
restored, m2 = run(restored, super_batch, jax.random.PRNGKey(7))
resume_loss = float(m2["loss"][-1])
resume_ok = bool(np.isfinite(resume_loss))
log(f"[soak] resume from step {rstep}: loss={resume_loss:.6f}")

print(json.dumps({
    "steps": total_steps,
    "wall_s": round(wall, 1),
    "steps_per_sec": round(total_steps / wall, 1),
    "loss_first": round(losses[0], 6),
    "loss_last": round(losses[-1], 6),
    "grad_norm_last": round(gnorms[-1], 5),
    "n_finite_samples": len(losses),
    "resume_ok": resume_ok,
}))
