"""Fused Adam(+EMA) update as ONE Pallas pass over the flat vectors.

The fused-optimizer stage is bandwidth-bound: per step it must stream
the flat gradient, params, both moments, and the EMA shadow through the
VPU once (read g/p/m/v/ema, write p/m/v/ema ~= 9 x 19.5 MB at the
flagship's 4.87M params -> ~0.22 ms at v5e HBM bandwidth). XLA lowers
the same math (train_state.fused_flat_update) as several fusions around
the scan carry and was measured at ~0.49 ms in-context (PERF.md
round-3 subsystem attribution; re-confirmed round 4) — this kernel does
the whole update in a single grid pass with explicit 1-D blocks (no
padding or reshape copies), aliasing p/m/v/ema in place.

Semantics are EXACTLY fused_flat_update's (the callers A/B-test parity):
optional global-norm clip (the norm itself is one cheap XLA reduction
computed BEFORE the kernel — clipping needs it globally), optional
weight decay, Adam with bias correction at count+1, optional EMA at a
precomputed decay. Moments may be stored bf16 (TrainConfig.bf16_moments)
— math runs f32 and rounds on store, matching the XLA path. Trailing
partial blocks compute on Mosaic's block padding and the out-of-range
lanes are dropped on store.

Used by fused_flat_update when NSG_FUSED_OPT=pallas (opt-in; default
stays XLA until the measured win is recorded in PERF.md) on the TPU
backend; every other configuration keeps the stock XLA lowering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

try:  # pragma: no cover - import shape differs across jax versions
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

__all__ = ["fused_adam_update", "supported"]

_BLOCK = 2048 * 128  # 1 MB f32 per ref per block; ~9 MB live < VMEM


def supported() -> bool:
    return pltpu is not None and jax.default_backend() == "tpu"


def _kernel(scalars, g, p, m, v, ema, p_out, m_out, v_out, ema_out,
            *, b1, b2, eps, clip, wd, has_ema):
    """One block of the update. ``scalars``: SMEM (5,) f32 —
    [gscale, lr, bias_corr1, bias_corr2, ema_decay]. The bias
    corrections (1 - beta^count) are precomputed outside: Mosaic cannot
    legalize powf with a runtime exponent."""
    gscale = scalars[0]
    lr = scalars[1]
    bc1 = scalars[2]
    bc2 = scalars[3]
    d = scalars[4]

    gb = g[:].astype(jnp.float32)
    pb = p[:]
    if clip:
        gb = gb * gscale
    if wd > 0.0:
        gb = gb + wd * pb
    mb = b1 * m[:].astype(jnp.float32) + (1.0 - b1) * gb
    vb = b2 * v[:].astype(jnp.float32) + (1.0 - b2) * gb * gb
    m_hat = mb / bc1
    v_hat = vb / bc2
    new_p = pb - lr * m_hat / (jnp.sqrt(v_hat) + eps)
    p_out[:] = new_p
    m_out[:] = mb.astype(m_out.dtype)
    v_out[:] = vb.astype(v_out.dtype)
    if has_ema:
        ema_out[:] = d * ema[:] + (1.0 - d) * new_p
    else:
        ema_out[:] = ema[:]


@functools.partial(
    jax.jit,
    static_argnames=("b1", "b2", "eps", "clip", "wd", "has_ema",
                     "interpret"),
)
def fused_adam_update(flat_g, flat_p, m, v, ema, gscale, lr, count_inc,
                      ema_decay, *, b1, b2, eps, clip, wd, has_ema,
                      interpret=False):
    """Run the fused update. All vector args are flat 1-D; ``ema`` may
    be a dummy zeros-like when ``has_ema`` is False (passed through).
    ``gscale`` is the precomputed clip factor (1.0 when clip is off),
    ``count_inc`` the post-increment count as f32, ``ema_decay`` the
    already-resolved decay (warmup applied by the caller). Returns
    (new_p, new_m, new_v, new_ema|None)."""
    n = flat_p.shape[0]
    if not has_ema:
        ema = jnp.zeros((n,), flat_p.dtype)
    cf = jnp.asarray(count_inc, jnp.float32)
    scalars = jnp.stack([
        jnp.asarray(gscale, jnp.float32),
        jnp.asarray(lr, jnp.float32),
        1.0 - jnp.asarray(b1, jnp.float32) ** cf,
        1.0 - jnp.asarray(b2, jnp.float32) ** cf,
        jnp.asarray(ema_decay, jnp.float32),
    ])

    grid = (pl.cdiv(n, _BLOCK),)
    blk = lambda: pl.BlockSpec((_BLOCK,), lambda i: (i,))  # noqa: E731
    kernel = functools.partial(
        _kernel, b1=b1, b2=b2, eps=eps, clip=clip, wd=wd, has_ema=has_ema
    )
    out_shapes = [
        jax.ShapeDtypeStruct((n,), flat_p.dtype),
        jax.ShapeDtypeStruct((n,), m.dtype),
        jax.ShapeDtypeStruct((n,), v.dtype),
        jax.ShapeDtypeStruct((n,), ema.dtype),
    ]
    p_new, m_new, v_new, e_new = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            blk(), blk(), blk(), blk(), blk(),
        ],
        out_specs=[blk(), blk(), blk(), blk()],
        out_shape=out_shapes,
        input_output_aliases={2: 0, 3: 1, 4: 2, 5: 3},
        interpret=interpret,  # CPU parity tests run the interpreter
    )(scalars, flat_g.astype(jnp.float32), flat_p, m, v, ema)

    return p_new, m_new, v_new, (e_new if has_ema else None)
