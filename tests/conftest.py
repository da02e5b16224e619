"""Test harness: force an 8-device virtual CPU mesh before JAX import.

This is how the framework tests multi-chip sharding without TPU hardware
(SURVEY.md §4 implication): `--xla_force_host_platform_device_count=8`
gives 8 fake devices on CPU, so pjit/shard_map paths compile and execute
the same collective graphs they would over ICI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin ignores the JAX_PLATFORMS env override; force via config.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by XLA compiles of
# programs whose HLO is identical run over run (measured 17s -> 9s on the
# slowest model test once warm). Cold first runs are unchanged. Same
# helper (and per-user default path) as the CLI entry points.
from neural_sound_generation_tpu.utils.compilation_cache import (  # noqa: E402
    enable_persistent_cache,
)

enable_persistent_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight tests (multi-process spawns, full-size jit "
        "compiles); deselect with -m 'not slow' for the quick tier",
    )


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
