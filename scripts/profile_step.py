"""Per-op profile of the flagship VQ-VAE train step (round-4 item 4).

Captures a ``jax.profiler`` trace of the production multi-step program
(bench.py configuration: B=64, 80x28 mel, dim 256, z 512, bf16 compute,
scan x64) and aggregates DEVICE op durations from the trace's
``*.trace.json.gz`` (the perfetto/chrome-trace events XProf writes), so
the conv core's 57%-of-roofline can be split by actual executed fusion
— complementary to the whole-program ablation in conv_attribution.py.

Prints the top-N device ops by total time as JSON lines.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BATCH, MELS, FRAMES = 64, 80, 28
DIM, Z_DIM = 256, 512


def capture(logdir: str, multi: int = 64, launches: int = 4):
    import jax
    import jax.numpy as jnp

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import create_train_state
    from neural_sound_generation_tpu.training.trainer import (
        make_multistep_train,
    )

    cfg = Config().parse(f"batch_size={BATCH}")
    model = VQVAE(input_dim=1, dim=DIM, z_dim=Z_DIM, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(0)
        .standard_normal((BATCH, MELS, FRAMES, 1))
        .astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, cfg.train)
    run = make_multistep_train(model, cfg, multi, donate=False)
    super_batch = {"x": jnp.tile(x[None], (multi, 1, 1, 1, 1))}
    key = jax.random.PRNGKey(0)

    state, metrics = run(state, super_batch, key)  # compile + warm
    _ = float(np.asarray(jax.device_get(metrics["loss"]))[-1])

    jax.profiler.start_trace(logdir)
    for i in range(launches):
        state, metrics = run(state, super_batch, jax.random.fold_in(key, i))
    _ = float(np.asarray(jax.device_get(metrics["loss"]))[-1])
    jax.profiler.stop_trace()
    return multi * launches


def parse(logdir: str, n_steps: int, top: int = 40):
    paths = glob.glob(
        os.path.join(logdir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(json.dumps({"error": f"no trace.json.gz under {logdir}"}))
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device; XLA ops
    # are complete events ('X') with durations in us
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e.get("pid")] = e.get("args", {}).get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if any(k in name.lower() for k in ("tpu", "device", "xla"))
        and "host" not in name.lower()
    }
    by_op = defaultdict(float)
    count = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if device_pids and e.get("pid") not in device_pids:
            continue
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        by_op[name] += dur
        count[name] += 1
        total += dur
    print(json.dumps({"trace": os.path.basename(path),
                      "device_total_ms": round(total / 1e3, 3),
                      "per_step_ms": round(total / 1e3 / n_steps, 4),
                      "lanes": sorted(
                          pid_names[p] for p in device_pids
                          if p in pid_names)[:6]}))
    ranked = sorted(by_op.items(), key=lambda kv: -kv[1])[:top]
    for name, dur in ranked:
        print(json.dumps({
            "op": name[:160], "total_ms": round(dur / 1e3, 3),
            "per_step_us": round(dur / n_steps, 2),
            "calls": count[name],
            "share_pct": round(100 * dur / max(total, 1e-9), 2),
        }))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--logdir", default="/tmp/nsg-profile")
    ap.add_argument("--multi", type=int, default=64)
    ap.add_argument("--launches", type=int, default=4)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    if args.parse_only:
        parse(args.logdir, args.multi * args.launches, args.top)
        return
    n = capture(args.logdir, args.multi, args.launches)
    parse(args.logdir, n, args.top)


if __name__ == "__main__":
    main()
