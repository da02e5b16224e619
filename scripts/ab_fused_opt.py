"""Same-window A/B of the fused-optimizer lowering: XLA fusion chain vs
the single-pass Pallas kernel (NSG_FUSED_OPT=pallas).

Two legs in ONE process (the only comparison the axon tunnel supports),
stock-sandwich order xla -> pallas -> xla, on the flagship bench
configuration (B=64, 80x28 mel, dim 256, z 512, bf16 model, scan x64).
Also asserts numeric parity of one update (the kernel must match
train_state.fused_flat_update bit-for-bit-ish in f32).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

BATCH, MELS, FRAMES = 64, 80, 28
DIM, Z_DIM = 256, 512


def parity_check():
    """One update, both lowerings, same inputs -> allclose."""
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.training.train_state import (
        _fused_opt_init, fused_flat_update,
    )

    cfg = Config().parse("batch_size=4").train
    rng = np.random.default_rng(0)
    n = 1_234_567  # deliberately not a multiple of the block size
    params = {"w": jnp.asarray(rng.standard_normal(n).astype(np.float32))}
    s = _fused_opt_init(params, cfg, use_schedule=False)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    p = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    m = jnp.zeros(n) + 0.01
    v = jnp.zeros(n) + 0.002
    ema = p * 0.9
    count = jnp.asarray(7, jnp.int32)
    step = jnp.asarray(7, jnp.int32)

    outs = {}
    for mode in ("xla", "pallas"):
        os.environ["NSG_FUSED_OPT"] = mode
        res = jax.jit(
            lambda: fused_flat_update(
                s, count, m, v, p, g, ema, 0.9999, False, step
            )
        )()
        outs[mode] = [np.asarray(x) for x in res[:4]]
    os.environ["NSG_FUSED_OPT"] = "xla"
    for a, b, name in zip(outs["xla"], outs["pallas"],
                          ["p", "m", "v", "ema"]):
        np.testing.assert_allclose(a, b, atol=1e-6, rtol=1e-6,
                                   err_msg=name)
    print(json.dumps({"parity": "ok", "n": n}), flush=True)


def build_run(mode: str):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import create_train_state
    from neural_sound_generation_tpu.training.trainer import (
        make_multistep_train,
    )

    os.environ["NSG_FUSED_OPT"] = mode
    cfg = Config().parse(f"batch_size={BATCH}")
    model = VQVAE(input_dim=1, dim=DIM, z_dim=Z_DIM, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((BATCH, MELS, FRAMES, 1))
        .astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, cfg.train)
    run = make_multistep_train(model, cfg, 64, donate=False)
    super_batch = jax.device_put({"x": jnp.tile(x[None], (64, 1, 1, 1, 1))})
    return run, state, super_batch


def time_leg(mode: str, launches: int = 8):
    run, state, super_batch = build_run(mode)
    key = jax.random.PRNGKey(1)
    state2, m = run(state, super_batch, key)  # compile + warm
    last = float(np.asarray(jax.device_get(m["loss"]))[-1])
    t0 = time.perf_counter()
    for i in range(launches):
        state2, m = run(state2, super_batch, jax.random.fold_in(key, i))
    last = float(np.asarray(jax.device_get(m["loss"]))[-1])
    dt = time.perf_counter() - t0
    ms = dt / (launches * 64) * 1e3
    print(json.dumps({"leg": mode, "ms_per_step": round(ms, 4),
                      "steps_per_s": round(1e3 / ms, 1),
                      "loss": round(last, 4)}), flush=True)
    return ms


def main():
    print(json.dumps({"env": str(jax.devices()[0])}), flush=True)
    parity_check()
    a1 = time_leg("xla")
    b = time_leg("pallas")
    a2 = time_leg("xla")
    print(json.dumps({
        "summary": {
            "xla_ms": round(min(a1, a2), 4),
            "pallas_ms": round(b, 4),
            "delta_ms": round(min(a1, a2) - b, 4),
            "speedup_pct": round(100 * (min(a1, a2) / b - 1), 2),
        }
    }), flush=True)


if __name__ == "__main__":
    main()
