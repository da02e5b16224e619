"""Long-T attention A/B at the hier-bottom grid (round-4 item 7's
stronger half): T=2240 (40x56 codes), dim 128, 2 heads of 64 — the
shape where round 3 measured stock XLA at 102 ms fwd+bwd (2.5 GB of
softmax residuals) and the fused Pallas kernel at 151 ms (VMEM-starved
32-row Q tiles).

Legs (same process, stock sandwich): xla -> chunked -> flash -> xla,
each timing the FULL TransformerPrior fwd+bwd (value_and_grad of the
NLL) — the in-context number the hier-bottom training step pays.
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

B, HGRID, WGRID = 16, 40, 56  # T = 2240
DIM, HEADS, LAYERS, K = 128, 2, 4, 512


def main():
    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.ops.pallas import attention as fa

    rng = np.random.default_rng(0)
    model = TransformerPrior(
        input_dim=K, dim=DIM, n_layers=LAYERS, n_heads=HEADS,
        n_classes=7, max_rows=64, max_cols=64,
    )
    codes = jnp.asarray(
        rng.integers(0, K, size=(B, HGRID, WGRID)), jnp.int32
    )
    labels = jnp.asarray(np.arange(B) % 7, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes, labels)
    params = jax.device_put(variables["params"])
    print(json.dumps({"env": str(jax.devices()[0]),
                      "t": HGRID * WGRID, "batch": B, "dim": DIM,
                      "heads": HEADS, "layers": LAYERS}), flush=True)

    def nll_fn(p):
        logits = model.apply({"params": p}, codes, labels)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(
            jnp.take_along_axis(logp, codes[..., None], axis=-1)
        )

    # compile all three steps up front, then INTERLEAVE short timed
    # bursts across several rounds: the axon tunnel's quality varies
    # >10x between windows (a stock-sandwich run measured the same xla
    # leg at 803 then 57 ms), so only tightly interleaved medians are
    # comparable
    steps = {}
    for backend in ["xla", "chunked", "flash"]:
        fa.set_backend(backend)
        try:
            step = jax.jit(jax.value_and_grad(nll_fn))
            val, _ = step(params)
            print(json.dumps({"compiled": backend,
                              "nll": round(float(val), 4)}), flush=True)
            steps[backend] = step
        finally:
            fa.set_backend("auto")

    results = {b: [] for b in steps}
    for rnd in range(5):
        for backend, step in steps.items():
            iters = 6
            p = params
            val, grads = step(p)
            _ = float(val)  # drain before the timed burst
            t0 = time.perf_counter()
            for _ in range(iters):
                val, grads = step(p)
                p = jax.tree_util.tree_map(
                    lambda p_, g: p_ - 0.0 * g, p, grads
                )
            v = float(val)
            dt = time.perf_counter() - t0
            ms = dt / iters * 1e3
            results[backend].append(ms)
            print(json.dumps({"round": rnd, "leg": backend,
                              "fwd_bwd_ms": round(ms, 2),
                              "nll": round(v, 4)}), flush=True)
    med = {b: float(np.median(v)) for b, v in results.items()}
    spread = {
        b: round(max(v) / min(v), 2) for b, v in results.items()
    }
    print(json.dumps({"summary": {
        "median_ms": {b: round(m, 2) for b, m in med.items()},
        "per_backend_spread": spread,
        "chunked_vs_xla_x": round(med["xla"] / med["chunked"], 2),
        "flash_vs_xla_x": round(med["xla"] / med["flash"], 2),
    }}), flush=True)


if __name__ == "__main__":
    main()
