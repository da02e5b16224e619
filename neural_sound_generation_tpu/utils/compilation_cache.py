"""Persistent XLA compilation cache for the CLI entry points.

Remote compiles through the TPU tunnel can take minutes per program in
bad windows (a fused serving graph measured 692 s once, 0.17 s to run).
The persistent cache makes every cold start after the first read the
compiled binary from disk. Tests enable the same cache in
tests/conftest.py; ``NSG_JAX_CACHE_DIR`` overrides the location.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    # per-user default: a world-shared /tmp path would be unwritable for
    # the second user to come along (first creator owns it) and lets any
    # local user seed cache entries other users would deserialize
    return os.environ.get(
        "NSG_JAX_CACHE_DIR", f"/tmp/nsg_jax_cache-uid{os.getuid()}"
    )


def enable_persistent_cache() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", default_cache_dir())
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs: compile uncached
