"""Parity tests for the single-pass Pallas fused-Adam kernel
(ops/pallas/fused_adam.py) against the XLA reference math
(train_state.fused_flat_update) — run through the Pallas interpreter on
CPU; the on-chip A/B lives in scripts/ab_fused_opt.py / PERF.md."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.ops.pallas.fused_adam import (
    fused_adam_update,
)
from neural_sound_generation_tpu.training.train_state import (
    _fused_opt_init,
    fused_flat_update,
)


def _mk(n, bf16_moments=False, clip=None, wd=0.0):
    cfg = Config().parse("batch_size=4").train
    import dataclasses

    cfg = dataclasses.replace(
        cfg, bf16_moments=bf16_moments,
        clip_thresh=clip, weight_decay=wd,
    )
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.standard_normal(n).astype(np.float32))}
    s = _fused_opt_init(params, cfg, use_schedule=False)
    g = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    p = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mdt = jnp.bfloat16 if bf16_moments else jnp.float32
    m = (jnp.zeros(n) + 0.01).astype(mdt)
    v = (jnp.zeros(n) + 0.002).astype(mdt)
    ema = p * 0.9
    return s, g, p, m, v, ema


@pytest.mark.parametrize("n", [1024 * 256, 2048 * 128 * 2 + 777])
@pytest.mark.parametrize("bf16_moments", [False, True])
def test_kernel_matches_xla_update(n, bf16_moments):
    """Kernel == fused_flat_update on f32/bf16 moments, with a trailing
    partial block (n not a multiple of the block size)."""
    s, g, p, m, v, ema = _mk(n, bf16_moments=bf16_moments)
    count = jnp.asarray(7, jnp.int32)
    step = jnp.asarray(7, jnp.int32)
    want = fused_flat_update(s, count, m, v, p, g, ema, 0.9999, False, step)

    gscale = jnp.float32(1.0)
    got = fused_adam_update(
        g, p, m, v, ema, gscale, s.lr, (count + 1).astype(jnp.float32),
        jnp.float32(0.9999),
        b1=s.b1, b2=s.b2, eps=s.eps, clip=False, wd=0.0, has_ema=True,
        interpret=True,
    )
    for a, b, name in zip(want[:4], got, ["p", "m", "v", "ema"]):
        # bf16-STORED moments may differ by one bf16 ulp between the two
        # lowerings (round-on-store tie-breaking); the f32 math (p, ema)
        # must match tightly either way
        bf16_stored = bf16_moments and name in ("m", "v")
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            atol=1e-3 if bf16_stored else 2e-6,
            rtol=1e-2 if bf16_stored else 2e-6,
            err_msg=name,
        )


def test_kernel_clip_wd_and_no_ema():
    """Clip + weight decay + EMA-off combinations match the reference."""
    n = 100_003
    s, g, p, m, v, _ = _mk(n, clip=1.0, wd=0.01)
    count = jnp.asarray(2, jnp.int32)
    step = jnp.asarray(2, jnp.int32)
    want = fused_flat_update(s, count, m, v, p, g, None, 0.0, False, step)

    gnorm = jnp.linalg.norm(g)
    gscale = jnp.minimum(1.0, s.clip / jnp.maximum(gnorm, 1e-12))
    got = fused_adam_update(
        g, p, m, v, None, gscale, s.lr, (count + 1).astype(jnp.float32),
        jnp.float32(0.0),
        b1=s.b1, b2=s.b2, eps=s.eps, clip=True, wd=s.wd, has_ema=False,
        interpret=True,
    )
    assert got[3] is None
    for a, b, name in zip(want[:3], got[:3], ["p", "m", "v"]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6,
            err_msg=name,
        )
