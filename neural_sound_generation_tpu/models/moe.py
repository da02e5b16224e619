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
* :meth:`step` is the causal single-position form for KV-cached
  sampling: it carries per-expert queue counts and applies the SAME
  capacity drops the teacher-forced forward applies (cumsum over time
  is causal, so the sampler can reproduce it exactly) — cached decode
  stays the parity oracle for routed priors too.
"""

from __future__ import annotations

from typing import Any, Tuple

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

    def setup(self):
        e, d, f = self.n_experts, self.dim, self.mlp_ratio * self.dim
        self.router = nn.Dense(e, dtype=jnp.float32, name="router")
        self.w_in = self.param(
            "w_in", nn.initializers.lecun_normal(), (e, d, f)
        )
        self.b_in = self.param("b_in", nn.initializers.zeros, (e, f))
        self.w_out = self.param(
            "w_out", nn.initializers.lecun_normal(), (e, f, d)
        )
        self.b_out = self.param("b_out", nn.initializers.zeros, (e, d))

    def capacity(self, t: int) -> int:
        """Per-expert queue capacity for a length-``t`` sequence — the
        value :meth:`step` must be given so sampling reproduces the
        teacher-forced drops."""
        return max(1, int(np.ceil(self.capacity_factor * t / self.n_experts)))

    def _route(self, h: jnp.ndarray):
        """(…, D) f32 -> (probs, expert, gate): top-1 routing in f32
        regardless of compute dtype (softmax over near-ties is what
        decides the expert; bf16 flips them)."""
        logits = self.router(h.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        return probs, jnp.argmax(probs, axis=-1), jnp.max(probs, axis=-1)

    def _experts(self, xs: jnp.ndarray) -> jnp.ndarray:
        """Apply every expert MLP to its slot block: (..., E, C, D) ->
        (..., E, C, D); rows that carry zeros produce garbage that the
        caller's combine mask discards."""
        xs = xs.astype(self.dtype)
        hh = jnp.einsum("...ecd,edf->...ecf", xs, self.w_in.astype(self.dtype))
        hh = nn.gelu(hh + self.b_in[:, None, :].astype(self.dtype))
        ys = jnp.einsum("...ecf,efd->...ecd", hh, self.w_out.astype(self.dtype))
        return ys + self.b_out[:, None, :].astype(self.dtype)

    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:
        b, t, d = h.shape
        e = self.n_experts
        probs, expert, gate = self._route(h)                # (B,T,E),(B,T),(B,T)

        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)  # (B, T, E)
        # position of each token in its expert's queue, per batch row
        pos = jnp.cumsum(onehot, axis=1) * onehot           # 1-indexed
        cap = self.capacity(t)
        keep = (pos > 0) & (pos <= cap)
        dispatch = onehot * keep                            # (B, T, E)

        # Switch aux loss: E * sum_e(fraction_dispatched_e * mean_prob_e)
        # == 1.0 at perfectly uniform routing, grows as experts collapse
        frac = jnp.mean(dispatch, axis=(0, 1))              # (E,)
        mean_p = jnp.mean(probs, axis=(0, 1))               # (E,)
        self.sow("moe_losses", "load_balance",
                 e * jnp.sum(frac * mean_p))
        # per-ROW stats for the pipeline-parallel path: routing and
        # capacity are per row (cumsum over axis=1), so the global
        # frac/mean_p are exact means of these rows — a PP run carries
        # them per microbatch and recombines to the identical aux loss
        # (parallel/pipeline.py routed path). Dropped silently when the
        # caller only mutates 'moe_losses'.
        self.sow("moe_stats", "rows",
                 jnp.stack([jnp.mean(dispatch, axis=1),
                            jnp.mean(probs, axis=1)], axis=1))  # (B, 2, E)

        slot = jax.nn.one_hot(
            (pos - 1.0).astype(jnp.int32), cap, dtype=jnp.float32
        )
        slot = slot * dispatch[..., None]                   # (B, T, E, C)

        xs = jnp.einsum("btec,btd->becd", slot, h.astype(jnp.float32))
        ys = self._experts(xs)                              # (B, E, C, D)

        combine = slot * gate[..., None, None]              # (B, T, E, C)
        y = jnp.einsum("btec,becd->btd", combine,
                       ys.astype(jnp.float32))
        return y.astype(h.dtype)

    def step(
        self, h: jnp.ndarray, counts: jnp.ndarray, cap: int
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """One causal position for KV-cached sampling.

        ``h``: (B, D) the post-ln2 activation at position t; ``counts``:
        (B, E) int32 — tokens already DISPATCHED (not just routed) to
        each expert at positions < t; ``cap``: static int, must equal
        :meth:`capacity` of the full sequence length. Returns
        (y (B, D), new_counts). Reproduces ``__call__``'s routing AND
        its capacity drops exactly (the queue position of token t is
        ``counts[expert]+1``, a causal quantity)."""
        e = self.n_experts
        _, expert, gate = self._route(h)                    # (B,), (B,)
        onehot = jax.nn.one_hot(expert, e, dtype=jnp.float32)   # (B, E)
        has_room = (
            jnp.sum(onehot * counts.astype(jnp.float32), axis=-1) <
            float(cap)
        )                                                   # (B,)
        dispatch = onehot * has_room[:, None]               # (B, E)

        xs = jnp.einsum("be,bd->bed", dispatch, h.astype(jnp.float32))
        ys = self._experts(xs[:, :, None, :])[:, :, 0, :]   # (B, E, D)
        y = jnp.einsum("be,bed->bd", dispatch * gate[:, None],
                       ys.astype(jnp.float32))
        new_counts = counts + dispatch.astype(counts.dtype)
        return y.astype(h.dtype), new_counts
