"""Persistent XLA compilation cache for the CLI entry points.

Remote compiles through the TPU tunnel can take minutes per program in
bad windows (a fused serving graph measured 692 s once, 0.17 s to run).
The persistent cache makes every cold start after the first read the
compiled binary from disk. Tests enable the same cache in
tests/conftest.py; ``NSG_JAX_CACHE_DIR`` overrides the location.
"""

from __future__ import annotations

import os


def enable_persistent_cache() -> None:
    import jax

    cache_dir = os.environ.get("NSG_JAX_CACHE_DIR", "/tmp/nsg_jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knobs: compile uncached
