"""Checkpoint save AND restore.

The reference only saves (``torch.save`` of {'epoch','arch','state_dict',
'optimizer'} to ./models/{model}/checkpoint_{dataset}_{dim}_{z_dim}.pth.tar,
src/main.py:61-66) — there is no load path anywhere (SURVEY §5). Here both
directions exist, via Orbax, with step-numbered directories and a
latest-step query for resume.
"""

from __future__ import annotations

import atexit
import json
import logging
import os
import re
from typing import Any, Optional

import flax.serialization
import jax
import numpy as np
import orbax.checkpoint as ocp

_STEP_RE = re.compile(r"^step_(\d+)$")


def _host_pytree(tree):
    """Pull arrays to host numpy (keeps Orbax backend-agnostic on axon)."""
    return jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), tree)


# one background writer: saves stay ordered, and a second async save
# queues behind the first instead of racing it
_WRITER = None
_PENDING: list = []


def _writer():
    global _WRITER
    if _WRITER is None:
        from concurrent.futures import ThreadPoolExecutor

        _WRITER = ThreadPoolExecutor(max_workers=1,
                                     thread_name_prefix="nsg-ckpt")
    return _WRITER


def wait_for_pending() -> None:
    """Block until every async checkpoint write has landed (re-raising
    the first failure). Called automatically by restore/latest_step so a
    same-process resume always sees fully-written step dirs."""
    while _PENDING:
        _PENDING.pop(0).result()


def _drain_at_exit() -> None:
    # join outstanding async writes BEFORE interpreter teardown starts
    # shutting executors down: an orbax write racing exit dies with
    # "cannot schedule new futures after shutdown" and the last
    # checkpoint of a run silently never lands. Failures here are
    # logged, not raised — exit hooks are past the point of recovery.
    try:
        wait_for_pending()
    except Exception:  # pragma: no cover
        logging.getLogger("nsg.checkpoint").exception(
            "async checkpoint write failed during interpreter exit"
        )


# Registration order matters: plain atexit callbacks run AFTER
# threading._shutdown, which is where concurrent.futures tears its
# executors down — too late to save an in-flight write. Register on
# threading's exit hook instead, AFTER importing concurrent.futures so
# its _python_exit hook registered first: threading runs these hooks in
# REVERSE registration order, so the drain runs before executor
# shutdown (the same mechanism concurrent.futures itself relies on).
import concurrent.futures.thread  # noqa: E402,F401  (hook ordering)
import threading  # noqa: E402

try:
    threading._register_atexit(_drain_at_exit)
except AttributeError:  # pragma: no cover — very old Python
    atexit.register(_drain_at_exit)


def save(ckpt_dir: str, state: Any, step: int, extra: Optional[dict] = None,
         block: bool = True) -> str:
    """Save a train state (any pytree) under ``ckpt_dir/step_{step}``.

    ``extra`` (e.g. {'epoch': 3, 'arch': 'vqvae'}) is stored alongside —
    the reference's checkpoint metadata surface (main.py:216-220).

    ``block=False`` snapshots the state to host numpy synchronously
    (correct even when the caller's next train step donates the
    buffers) and runs the Orbax write on a background thread, so the
    train loop is stalled only by the device->host pull, not the disk
    write. ``wait_for_pending`` (or any restore/latest_step/blocking
    save) joins outstanding writes.
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    # name-based state dict (order-independent restore); device_get here,
    # BEFORE returning: the values are immutable host copies after this
    payload = {"state": _host_pytree(flax.serialization.to_state_dict(state))}
    if extra:
        payload["extra"] = extra

    def _write():
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
        if extra:
            # tiny sidecar AFTER the orbax commit: read_extra can answer
            # metadata queries (arch/conditioning validation) without
            # materializing the full params tree from disk
            try:
                with open(os.path.join(path, "_extra.json"), "w",
                          encoding="utf-8") as f:
                    json.dump(extra, f, default=_json_scalar)
            except (TypeError, OSError):  # pragma: no cover
                logging.getLogger("nsg.checkpoint").warning(
                    "could not write extra sidecar for %s", path
                )
        return path

    if block:
        wait_for_pending()  # keep step-dir creation ordered
        return _write()
    _PENDING.append(_writer().submit(_write))
    return path


def save_ema_sibling(
    ckpt_dir: str, state: Any, step: int, extra: Optional[dict] = None
) -> Optional[str]:
    """Export the averaged model (``state.eval_params``) as a sibling
    ``<ckpt_dir>_ema`` artifact in the ``{"params": ...}`` variables
    layout — the reference's intended synthesis/inference weights
    (hparams.py:116-118 exponential_moving_average / ema_decay;
    dataloader.py:246-262 clone_as_averaged_model). No-op (returns None)
    when the state carries no EMA shadow. Used by the prior and vocoder
    train CLIs; synthesize/sample/serve restore the artifact directly."""
    if getattr(state, "ema_params", None) is None:
        return None
    ema_dir = ckpt_dir.rstrip("/") + "_ema"
    payload_extra = dict(extra or {})
    payload_extra["averaged"] = True
    return save(
        ema_dir,
        {"params": jax.device_get(state.eval_params)},
        step=step,
        extra=payload_extra,
    )


def restore_ema_sibling(ckpt_dir: str, state: Any, step: Optional[int] = None):
    """Rehydrate ``state.ema_params`` from the ``<ckpt_dir>_ema`` sibling
    artifact that ``save_ema_sibling`` writes on every save.

    Without this a resumed run re-seeds the EMA from the resume-point
    params (create_train_state copies live params), so the exported
    averaged model stays pinned near those weights for ~1/(1-decay)
    steps — at the reference decay 0.9999 (hparams.py:118) that is
    ~10k steps of stale artifact after every preemption. No-op when the
    state carries no EMA or no sibling checkpoint exists."""
    if getattr(state, "ema_params", None) is None:
        return state
    ema_dir = ckpt_dir.rstrip("/") + "_ema"
    if latest_step(ema_dir) is None:
        return state
    from neural_sound_generation_tpu.training.train_state import FusedOptState

    template_params = state.params
    if isinstance(state.opt_state, FusedOptState):
        template_params = state.opt_state.unravel(state.ema_params)
    tree, _ = restore(ema_dir, {"params": template_params}, step=step)
    ema = tree["params"]
    if isinstance(state.opt_state, FusedOptState):
        from jax.flatten_util import ravel_pytree

        flat, _ = ravel_pytree(ema)
        return state.replace(ema_params=flat.astype(np.float32))
    return state.replace(ema_params=ema)


def latest_step(ckpt_dir: str) -> Optional[int]:
    wait_for_pending()  # async writes must be visible to resume queries
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _STEP_RE.match(name))
    ]
    return max(steps) if steps else None


def restore(ckpt_dir: str, template: Any, step: Optional[int] = None):
    """Restore (state, extra). ``template`` is a pytree with the target
    structure (e.g. a freshly created TrainState); ``step`` defaults to the
    latest checkpoint in the directory."""
    wait_for_pending()
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    template_sd = flax.serialization.to_state_dict(template)
    restored_sd = _adapt_fused_layout(template_sd, restored["state"])
    state_dict = _fill_missing(template_sd, restored_sd)
    # name-based graft onto the template structure
    state = flax.serialization.from_state_dict(template, state_dict)
    return state, restored.get("extra")


def _json_scalar(o):
    """json.dump default for numpy scalars in extra dicts."""
    if hasattr(o, "item"):
        return o.item()
    raise TypeError(f"not JSON serializable: {type(o)}")


def read_extra(ckpt_dir: str, step: Optional[int] = None) -> Optional[dict]:
    """The ``extra`` metadata of a checkpoint (latest step by default)
    WITHOUT a state template — for callers that must validate recorded
    metadata (e.g. the vocoder's conditioning chain, evaluate's model
    shape) before they can even build the matching model. Prefers the
    tiny ``_extra.json`` sidecar ``save`` writes; falls back to a full
    orbax restore for checkpoints written before the sidecar existed.
    Returns None when no checkpoint or no extra exists."""
    wait_for_pending()
    at = step if step is not None else latest_step(ckpt_dir)
    if at is None:
        return None
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{at}")
    sidecar = os.path.join(path, "_extra.json")
    if os.path.exists(sidecar):
        try:
            with open(sidecar, encoding="utf-8") as f:
                got = json.load(f)
            if isinstance(got, dict):
                return got
        except (OSError, ValueError):  # pragma: no cover — fall through
            pass
    with ocp.PyTreeCheckpointer() as ckptr:
        payload = ckptr.restore(path)
    extra = payload.get("extra")
    return dict(extra) if isinstance(extra, dict) else None


def _find_adam_sd(opt_sd: dict) -> Optional[dict]:
    """The ScaleByAdamState sub-dict ({'count','mu','nu'}) inside a
    serialized optax chain, at any position."""
    if "mu" in opt_sd and "nu" in opt_sd:
        return opt_sd
    for v in opt_sd.values():
        if isinstance(v, dict):
            found = _find_adam_sd(v)
            if found is not None:
                return found
    return None


def _adapt_fused_layout(template_sd, restored_sd):
    """Convert optimizer/EMA state between the per-leaf optax layout and
    the flat fused layout (TrainConfig.fused_optimizer) so checkpoints
    written under either flag value resume under the other with Adam
    moments and parameter-EMA intact.

    Detection is structural: a fused opt_state serializes as
    {'count','m','v'} flat vectors; the optax chain as indexed transform
    states with a {'count','mu','nu'} Adam sub-dict. Moment trees ravel/
    unravel in jax.tree_util order (sorted dict keys), matching
    FusedOptState's own ravel of the params tree."""
    if not isinstance(template_sd, dict) or not isinstance(restored_sd, dict):
        return restored_sd
    t_opt = template_sd.get("opt_state")
    r_opt = restored_sd.get("opt_state")
    if not isinstance(t_opt, dict) or not isinstance(r_opt, dict):
        return restored_sd
    t_fused = "m" in t_opt and "v" in t_opt
    r_fused = "m" in r_opt and "v" in r_opt
    if t_fused and r_fused:
        # same (fused) layout: honor the template's moment dtype
        # (TrainConfig.bf16_moments) — from_state_dict does no casting,
        # so without this a --resume silently keeps the checkpoint's
        # dtype and the flag has no effect
        out = restored_sd
        for key in ("m", "v"):
            t_leaf, r_leaf = t_opt.get(key), r_opt.get(key)
            if (
                hasattr(t_leaf, "dtype") and hasattr(r_leaf, "dtype")
                and t_leaf.dtype != r_leaf.dtype
            ):
                if out is restored_sd:
                    out = dict(restored_sd)
                    out["opt_state"] = dict(r_opt)
                out["opt_state"][key] = np.asarray(r_leaf, t_leaf.dtype)
                logging.getLogger("nsg.checkpoint").info(
                    "cast restored fused moment '%s' %s -> %s to match "
                    "the template (TrainConfig.bf16_moments)",
                    key, r_leaf.dtype, t_leaf.dtype,
                )
        return out
    if t_fused == r_fused:
        return restored_sd

    from jax.flatten_util import ravel_pytree

    log = logging.getLogger("nsg.checkpoint")
    out = dict(restored_sd)
    if t_fused:  # legacy checkpoint -> fused template
        adam = _find_adam_sd(r_opt)
        if adam is not None:
            out["opt_state"] = {
                "count": adam["count"],
                "m": np.asarray(ravel_pytree(adam["mu"])[0]),
                "v": np.asarray(ravel_pytree(adam["nu"])[0]),
            }
            log.info("converted per-leaf optax checkpoint state to the "
                     "fused flat layout (moments preserved)")
        ema = restored_sd.get("ema_params")
        if isinstance(ema, dict):
            out["ema_params"] = np.asarray(
                ravel_pytree(ema)[0], np.float32
            )
    else:  # fused checkpoint -> legacy optax template
        adam_t = _find_adam_sd(t_opt)
        if adam_t is not None and hasattr(r_opt.get("m"), "shape"):
            _, unravel_mu = ravel_pytree(adam_t["mu"])
            new_opt = _deep_copy_sd(t_opt)
            adam_new = _find_adam_sd(new_opt)
            adam_new["count"] = r_opt["count"]
            adam_new["mu"] = flax.serialization.to_state_dict(
                unravel_mu(r_opt["m"])
            )
            adam_new["nu"] = flax.serialization.to_state_dict(
                unravel_mu(r_opt["v"])
            )
            out["opt_state"] = new_opt
            log.info("converted fused checkpoint state to the per-leaf "
                     "optax layout (moments preserved)")
        ema = restored_sd.get("ema_params")
        t_ema = template_sd.get("ema_params")
        if hasattr(ema, "shape") and isinstance(t_ema, dict):
            _, unravel_e = ravel_pytree(t_ema)
            out["ema_params"] = flax.serialization.to_state_dict(
                unravel_e(ema)
            )
    return out


def _deep_copy_sd(sd):
    if isinstance(sd, dict):
        return {k: _deep_copy_sd(v) for k, v in sd.items()}
    return sd


def _fill_missing(template_sd, restored_sd, path=""):
    """Forward compatibility: fields added to TrainState after a checkpoint
    was written (e.g. codebook_ema) fall back to the template's value
    instead of failing the strict name-based restore.

    Every filled subtree is logged loudly: a fill under ``params`` almost
    always means the requested architecture does not match the checkpoint
    (e.g. ``--prior-layers`` larger than what was trained), and silently
    grafting fresh-init weights there produces a half-random model."""
    if not isinstance(template_sd, dict):
        return restored_sd
    if not isinstance(restored_sd, dict):
        return restored_sd
    out = {}
    for key, tmpl_val in template_sd.items():
        child = f"{path}/{key}" if path else key
        if key in restored_sd:
            out[key] = _fill_missing(tmpl_val, restored_sd[key], child)
        else:
            out[key] = tmpl_val
            logging.getLogger("nsg.checkpoint").warning(
                "checkpoint is missing '%s'; using the template's "
                "(fresh-init) value — if this is under params/opt_state, "
                "the model architecture likely does not match the "
                "checkpoint", child,
            )
    # keys present only in the checkpoint are dropped (template defines
    # the structure); from_state_dict would reject them anyway
    return out
