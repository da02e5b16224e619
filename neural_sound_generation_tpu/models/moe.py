"""Switch-routed mixture-of-experts MLP for the transformer prior.

The reference has no MoE anywhere (its largest model is a 24-layer
WaveNet); this is framework-native scaling capability in the same
spirit as the TP/SP/PP axes: grow the prior's parameter count without
growing per-token FLOPs, with the expert axis sharded over the mesh
(expert parallelism).

Design is the TPU-canonical dense-dispatch formulation (Switch
Transformer routing, Mesh-TF/flaxformer-style einsum dispatch) rather
than gather/scatter token shuffling:

* top-1 routing in f32, per-expert capacity ``ceil(cf * T / E)``;
  tokens over capacity are DROPPED (their MoE contribution is zero, the
  residual connection carries them) — the standard switch trade that
  keeps every shape static for XLA.
* dispatch/combine are one-hot einsums; with the expert axis of
  ``w_in``/``w_out`` sharded over 'model' (parallel/mesh.py rule),
  GSPMD turns them into the expert all-to-alls — no hand-written
  collectives, same declarative style as the rest of the framework.
* the Switch load-balance auxiliary loss is sown into the
  ``moe_losses`` collection; the trainer's prior loss adds it
  (weight ``aux_weight``) when the model routes.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["SwitchMoE"]


class SwitchMoE(nn.Module):
    """Top-1 routed expert MLP: (B, T, D) -> (B, T, D).

    Drop-in for the dense ``mlp_out(gelu(mlp_in(h)))`` pair in the
    transformer block. Each batch row is a routing group (capacity is
    per row), so behavior is batch-size independent."""

    dim: int
    n_experts: int
    mlp_ratio: int = 4
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        b, t, d = h.shape
        e, f = self.n_experts, self.mlp_ratio * self.dim
        # routing runs in f32 regardless of compute dtype (softmax over
        # near-ties is what decides the expert; bf16 flips them)
        logits = nn.Dense(e, dtype=jnp.float32, name="router")(
            h.astype(jnp.float32)
        )                                                   # (B, T, E)
        probs = jax.nn.softmax(logits, axis=-1)
        expert = jnp.argmax(probs, axis=-1)                 # (B, T)
        gate = jnp.max(probs, axis=-1)                      # (B, T)

        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (B, T, E)
        # position of each token in its expert's queue, per batch row
        pos = jnp.cumsum(onehot, axis=1) * onehot           # 1-indexed
        cap = max(1, int(np.ceil(self.capacity_factor * t / e)))
        keep = (pos > 0) & (pos <= cap)
        dispatch = onehot * keep                            # (B, T, E)

        # Switch aux loss: E * sum_e(fraction_dispatched_e * mean_prob_e)
        # == 1.0 at perfectly uniform routing, grows as experts collapse
        frac = jnp.mean(dispatch, axis=(0, 1))              # (E,)
        mean_p = jnp.mean(probs, axis=(0, 1))               # (E,)
        self.sow("moe_losses", "load_balance",
                 e * jnp.sum(frac * mean_p))

        slot = jax.nn.one_hot(
            (pos - 1.0).astype(jnp.int32), cap, dtype=jnp.float32
        )
        slot = slot * dispatch[..., None]                   # (B, T, E, C)

        w_in = self.param(
            "w_in", nn.initializers.lecun_normal(), (e, d, f)
        )
        b_in = self.param("b_in", nn.initializers.zeros, (e, f))
        w_out = self.param(
            "w_out", nn.initializers.lecun_normal(), (e, f, d)
        )
        b_out = self.param("b_out", nn.initializers.zeros, (e, d))

        xs = jnp.einsum("btec,btd->becd", slot, h.astype(jnp.float32))
        xs = xs.astype(self.dtype)
        hh = jnp.einsum("becd,edf->becf", xs, w_in.astype(self.dtype))
        hh = nn.gelu(hh + b_in[None, :, None, :].astype(self.dtype))
        ys = jnp.einsum("becf,efd->becd", hh, w_out.astype(self.dtype))
        ys = ys + b_out[None, :, None, :].astype(self.dtype)

        combine = slot * gate[..., None, None]              # (B, T, E, C)
        y = jnp.einsum("btec,becd->btd", combine,
                       ys.astype(jnp.float32))
        return y.astype(h.dtype)
