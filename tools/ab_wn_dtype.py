"""A/B: WaveNet teacher-forced training, f32 vs bf16 compute (TPU).

Both legs in one process, back-to-back (flagship vocoder shape:
24 layers / 4 stacks / residual 128, batch 4 x 8192 samples, mel
conditioning, scan x16). Prints one JSON line
{f32: [steps_per_sec, loss_first, loss_last], bf16: [...]}.
Methodology per PERF.md: host materialization as the timing barrier.
"""
import sys, time, json
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
from neural_sound_generation_tpu.utils.compilation_cache import enable_persistent_cache
enable_persistent_cache()
from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import WaveNet
from neural_sound_generation_tpu.training import create_train_state
from neural_sound_generation_tpu.training.trainer import make_multistep_train

BATCH, T, MULTI, STEPS = 4, 8192, 16, 96
cfg = Config().parse(f"batch_size={BATCH}")
g = np.random.default_rng(0)
y = jnp.asarray(g.standard_normal((BATCH, T, 1)).astype(np.float32) * 0.3)
c = jnp.asarray(g.standard_normal((BATCH, T // 256, 80)).astype(np.float32))
sup = {"y": jnp.tile(y[None], (MULTI, 1, 1, 1)),
       "c": jnp.tile(c[None], (MULTI, 1, 1, 1))}
res = {}
for name, dt in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
    model = WaveNet(out_channels=30, layers=24, stacks=4,
                    residual_channels=128, gate_channels=128,
                    skip_out_channels=128, cin_channels=80,
                    gin_channels=-1, scalar_input=True, dtype=dt)
    v = model.init(jax.random.PRNGKey(0),
                   WaveNet.shift_inputs(y, True), c, None)
    state = create_train_state(v, cfg.train)
    run = make_multistep_train(model, cfg, MULTI, donate=True)
    state, m = run(state, sup, jax.random.PRNGKey(0))
    l0 = float(m["loss"][-1])
    t0 = time.perf_counter()
    for i in range(1, STEPS // MULTI):
        state, m = run(state, sup, jax.random.PRNGKey(i))
    lf = float(m["loss"][-1])  # host barrier
    dtm = time.perf_counter() - t0
    sps = (STEPS // MULTI - 1) * MULTI / dtm
    res[name] = (round(sps, 1), round(l0, 3), round(lf, 3))
    print(f"[wn-{name}] {sps:.1f} steps/s loss {l0:.3f}->{lf:.3f}",
          file=sys.stderr, flush=True)
print(json.dumps(res))
