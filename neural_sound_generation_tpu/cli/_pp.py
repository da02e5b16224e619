"""Shared pipeline-parallel training loop for the prior/vocoder CLIs.

Both ``cli.prior train --mesh-pipe`` and ``cli.vocoder train
--mesh-pipe`` run the same lifecycle — DPxPP mesh validation,
partitioned state, dual-path resume (``*_pp_train`` sibling with dense
moments, artifact fallback), dense mesh-width-independent checkpoint
export, epoch/interval loop — differing only in the model-specific
partition/unpartition callables and guards. This module is the single
source of that lifecycle (a round-4 review finding: the two CLIs had
diverged-by-copy versions of it)."""

from __future__ import annotations

from typing import Callable, Iterable

import numpy as np

import jax


def validate_pp_mesh(n_pipe: int, n_data: int, n_micro: int,
                     batch_size: int) -> None:
    """Common PP misconfigurations become readable SystemExits instead
    of shard_map tracebacks."""
    if n_data * n_pipe > len(jax.devices()):
        raise SystemExit(
            f"mesh {n_data}x{n_pipe} needs {n_data * n_pipe} devices, "
            f"have {len(jax.devices())}"
        )
    if batch_size % n_micro:
        raise SystemExit(
            f"--pp-microbatches {n_micro} must divide --batch-size "
            f"{batch_size}"
        )
    if (batch_size // n_micro) % n_data:
        raise SystemExit(
            f"microbatch size {batch_size // n_micro} "
            f"(--batch-size {batch_size} / --pp-microbatches {n_micro}) "
            f"must divide over --mesh-data {n_data} (the microbatch axis "
            f"is data-sharded)"
        )


def run_pp_training(
    *,
    ckpt_dir: str,
    resume: bool,
    epochs: int,
    n_pipe: int,
    n_data: int,
    n_micro: int,
    checkpoint_interval: int,
    set_epoch: Callable[[int], None],
    epoch_batches: Callable[[], Iterable[dict]],
    build: Callable,
    partition: Callable,
    unpartition: Callable,
    split_dense: Callable,
    variables,
    kind: str,
    epoch_line: Callable[[int, float], str],
    ema_decay: float = 0.0,
    ema_warmup: bool = False,
    extra_meta: dict | None = None,
) -> None:
    """The PP train lifecycle. ``build(n_pipe, n_data, n_micro) ->
    (mesh, tx, init_fn, step_fn)``; ``partition(variables_or_params,
    mesh) -> (rest, stacked)`` places the persistent layout;
    ``unpartition(rest, stacked) -> dense`` gathers the checkpoint
    layout; ``split_dense(dense) -> (rest, stacked)`` is the structural
    split for re-partitioning restored Adam moments. Checkpoints:
    artifact at ``ckpt_dir`` in the dense layout every downstream
    restore path uses, full dense params+moments (+EMA) at
    ``<ckpt_dir>_pp_train``.

    ``ema_decay > 0`` maintains an averaged-model shadow in the SAME
    stage-sharded layout (one fused elementwise launch per step) and
    exports it as the ``<ckpt_dir>_ema`` sibling — the reference's
    intended synthesis weights (hparams.py:116-118), previously absent
    under PP. ``ema_warmup`` ramps the decay min(decay, (1+t)/(10+t))
    like the dense path.
    """
    from neural_sound_generation_tpu.parallel import pipeline as pp
    from neural_sound_generation_tpu.training import checkpoint
    from neural_sound_generation_tpu.training.train_state import (
        resolve_ema_decay,
    )

    mesh, tx, init_fn, step_fn = build(n_pipe, n_data, n_micro)
    rest, stacked = partition(variables, mesh)
    opt_state = init_fn(rest, stacked)
    ema = None
    if ema_decay and ema_decay > 0:
        # an independent copy in the identical stage-sharded placement.
        # device_get matters: unpartition returns the LIVE buffers for
        # the replicated part, and the first donating step would delete
        # them out from under the shadow
        ema = partition(
            {"params": jax.device_get(unpartition(rest, stacked))}, mesh
        )

    @jax.jit
    def ema_step(e, pair, step):
        # the decay schedule is computed INSIDE the jit from a traced
        # step scalar: the warmup branch of resolve_ema_decay returns a
        # jnp value, and float()-ing it per step forced a device->host
        # sync that serialized the otherwise-async PP dispatch
        # (round-4 advisor finding)
        d = resolve_ema_decay(ema_decay, ema_warmup, step)
        return jax.tree_util.tree_map(
            lambda ee, px: d * ee + (1.0 - d) * px, e, pair
        )

    print(f"pp {kind}: dp{n_data}xpp{n_pipe}, {n_micro} microbatches"
          + ("" if ema is not None else
             "; EMA off — no *_ema artifact"))

    step_total, start_epoch = 0, 1
    # PP stores dense params+moments — a different layout from the
    # standard TrainState *_train sibling, so it gets its own name and
    # a dense-trained run resumed under --mesh-pipe (or vice versa)
    # falls back to the artifact instead of misgrafting
    train_dir = ckpt_dir.rstrip("/") + "_pp_train"
    if resume:
        if checkpoint.latest_step(train_dir) is not None:
            template = {
                "params": unpartition(rest, stacked),
                "opt": pp.pp_opt_state_to_dense(opt_state, unpartition),
            }
            restored, extra = checkpoint.restore(train_dir, template)
            rest, stacked = partition({"params": restored["params"]}, mesh)
            opt_state = pp.pp_opt_state_from_dense(
                restored["opt"], split_dense, mesh
            )
            if ema is not None:
                # second pass with the RESTORED params as the template:
                # a sibling that carries an "ema" leaf restores it,
                # a pre-EMA sibling grafts the resume-point params —
                # never the fresh-init weights the shadow was seeded
                # from before restore
                got, _ = checkpoint.restore(
                    train_dir,
                    {"ema": jax.device_get(restored["params"])},
                )
                ema = partition({"params": got["ema"]}, mesh)
            step_total = checkpoint.latest_step(train_dir)
            start_epoch = int((extra or {}).get("epoch", 0)) + 1
            print(f"resumed pp train state from step {step_total}, "
                  f"epoch {start_epoch} (mesh dp{n_data}xpp{n_pipe})")
        elif checkpoint.latest_step(ckpt_dir) is not None:
            restored, extra = checkpoint.restore(
                ckpt_dir, {"params": unpartition(rest, stacked)}
            )
            rest, stacked = partition({"params": restored["params"]}, mesh)
            opt_state = init_fn(rest, stacked)
            if ema is not None:
                # the shadow must NOT stay at the fresh-init weights
                # captured before restore: prefer the *_ema sibling a
                # dense run wrote, else re-seed from the resume-point
                # params (the dense path's convention)
                ema_dir = ckpt_dir.rstrip("/") + "_ema"
                seed = jax.device_get(restored["params"])
                if checkpoint.latest_step(ema_dir) is not None:
                    got, _ = checkpoint.restore(ema_dir, {"params": seed})
                    seed = got["params"]
                ema = partition({"params": seed}, mesh)
            step_total = checkpoint.latest_step(ckpt_dir)
            start_epoch = int((extra or {}).get("epoch", 0)) + 1
            print(f"resumed params from step {step_total}, epoch "
                  f"{start_epoch} (no *_pp_train sibling: Adam moments "
                  f"restart)")

    def save_ckpt(completed_epoch: int) -> None:
        # the artifact is the SAME dense layout the dense/TP paths
        # export — sample/synthesize/serve restore it unchanged.
        # completed_epoch is the last FINISHED epoch — interval saves
        # inside epoch N store N-1 so a preempted run replays epoch N
        # with its pinned shuffle order rather than skipping its tail.
        dense = unpartition(rest, stacked)
        extra = {"epoch": completed_epoch, **(extra_meta or {})}
        checkpoint.save(
            ckpt_dir, {"params": dense}, step=step_total, extra=extra
        )
        sibling = {
            "params": dense,
            "opt": pp.pp_opt_state_to_dense(opt_state, unpartition),
        }
        if ema is not None:
            dense_ema = unpartition(*ema)
            sibling["ema"] = dense_ema
            checkpoint.save(
                ckpt_dir.rstrip("/") + "_ema", {"params": dense_ema},
                step=step_total,
                extra={**extra, "averaged": True},
            )
        checkpoint.save(
            train_dir, sibling, step=step_total, extra=extra, block=False,
        )

    for epoch in range(start_epoch, epochs + 1):
        # shuffle order is f(seed, epoch): --resume replays the exact
        # batch order an uninterrupted run's epoch-N pass would see
        set_epoch(epoch - 1)
        loss_sum, count = 0.0, 0
        for batch in epoch_batches():
            rest, stacked, opt_state, metrics = step_fn(
                rest, stacked, opt_state, batch
            )
            step_total += 1
            if ema is not None:
                # step_total is post-increment; the shared schedule
                # takes the pre-increment step (traced — no host sync)
                ema = ema_step(
                    ema, (rest, stacked), np.int32(step_total - 1)
                )
            loss_sum += metrics["loss"]
            count += 1
            if checkpoint_interval and step_total % checkpoint_interval == 0:
                save_ckpt(completed_epoch=epoch - 1)
        mean = float(loss_sum) / max(count, 1)
        print(epoch_line(epoch, mean)
              + f" [pp{n_pipe} x dp{n_data}, {n_micro} microbatches]")
        save_ckpt(completed_epoch=epoch)
    print(f"{kind} saved to {ckpt_dir} (dense artifact; trained "
          f"pipeline-parallel over {n_pipe} stages)")
