"""Checkpoint save AND restore.

The reference only saves (``torch.save`` of {'epoch','arch','state_dict',
'optimizer'} to ./models/{model}/checkpoint_{dataset}_{dim}_{z_dim}.pth.tar,
src/main.py:61-66) — there is no load path anywhere (SURVEY §5). Here both
directions exist, via Orbax, with step-numbered directories and a
latest-step query for resume.
"""

from __future__ import annotations

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


def save(ckpt_dir: str, state: Any, step: int, extra: Optional[dict] = None) -> str:
    """Save a train state (any pytree) under ``ckpt_dir/step_{step}``.

    ``extra`` (e.g. {'epoch': 3, 'arch': 'vqvae'}) is stored alongside —
    the reference's checkpoint metadata surface (main.py:216-220).
    """
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    # name-based state dict (order-independent restore)
    payload = {"state": _host_pytree(flax.serialization.to_state_dict(state))}
    if extra:
        payload["extra"] = extra
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, payload, force=True)
    return path


def latest_step(ckpt_dir: str) -> Optional[int]:
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
    if step is None:
        step = latest_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {ckpt_dir}")
    path = os.path.join(os.path.abspath(ckpt_dir), f"step_{step}")
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path)
    state_dict = _fill_missing(
        flax.serialization.to_state_dict(template), restored["state"]
    )
    # name-based graft onto the template structure
    state = flax.serialization.from_state_dict(template, state_dict)
    return state, restored.get("extra")


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
