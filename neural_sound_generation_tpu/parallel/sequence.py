"""Sequence-axis parallelism: sharded 1-D convolution with halo exchange.

The reference bounds sequence length instead of scaling it (crop to
max_time_steps, offline 8 s chunking — SURVEY §5 "long-context"). For
long-form audio beyond one chip's memory, the TPU-native construction is
to shard the *time* axis across the mesh and exchange conv halos between
neighbors over ICI: each device convolves its local segment after
receiving the (K-1)*dilation boundary samples from its neighbor(s) via
``ppermute`` inside ``shard_map``.

This module provides the primitive (``halo_conv1d``) and a whole-array
wrapper (``sharded_conv1d``); composing it over the WaveVQVAE/WaveNet
encoder stacks gives sequence-parallel encoding of hour-long audio
without changing model weights.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_conv1d(
    x_local: jnp.ndarray,
    kernel: jnp.ndarray,
    axis_name: str,
    causal: bool = True,
    dilation: int = 1,
) -> jnp.ndarray:
    """Per-shard 1-D conv with neighbor halo exchange.

    Call inside ``shard_map`` with the time axis sharded over
    ``axis_name``. ``x_local``: (B, T_local, Cin); ``kernel``:
    (K, Cin, Cout). Output: (B, T_local, Cout) — identical to slicing the
    full-sequence convolution at this shard's position.

    causal=True: left padding only (WaveNet convention) — each shard needs
    the last ``(K-1)*dilation`` samples of its LEFT neighbor. causal=False
    ('same'): halos from both sides.
    """
    k = kernel.shape[0]
    halo = (k - 1) * dilation
    idx = jax.lax.axis_index(axis_name)
    n = jax.lax.axis_size(axis_name)

    if halo > 0:
        # send my last `halo` samples to my RIGHT neighbor (they are its
        # left context); shard 0 gets zeros (sequence start padding)
        right_perm = [(i, (i + 1) % n) for i in range(n)]
        left_ctx = jax.lax.ppermute(
            x_local[:, -halo:, :], axis_name, right_perm
        )
        left_ctx = jnp.where(idx == 0, jnp.zeros_like(left_ctx), left_ctx)
    else:
        left_ctx = x_local[:, :0, :]

    if causal:
        padded = jnp.concatenate([left_ctx, x_local], axis=1)
        lo = 0
    else:
        half = halo // 2
        rhalo = halo - half
        left_perm = [(i, (i - 1) % n) for i in range(n)]
        right_ctx = jax.lax.ppermute(
            x_local[:, :rhalo, :] if rhalo > 0 else x_local[:, :0, :],
            axis_name,
            left_perm,
        )
        right_ctx = jnp.where(
            idx == n - 1, jnp.zeros_like(right_ctx), right_ctx
        )
        padded = jnp.concatenate(
            [left_ctx[:, halo - half :, :] if half > 0 else left_ctx[:, :0, :],
             x_local, right_ctx],
            axis=1,
        )
        lo = 0
    out = jax.lax.conv_general_dilated(
        padded,
        kernel,
        window_strides=(1,),
        padding=((lo, 0),) if causal else ((0, 0),),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return out


def sharded_conv1d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    mesh: Mesh,
    causal: bool = True,
    dilation: int = 1,
    axis: str = "data",
) -> jnp.ndarray:
    """Whole-array entry: shard the time axis of (B, T, Cin) over
    ``axis``, convolve with halo exchange, return (B, T, Cout) with the
    same sharding. T must divide evenly by the axis size."""
    n = mesh.shape[axis]
    assert x.shape[1] % n == 0, (
        f"time axis {x.shape[1]} must divide over {n} shards"
    )

    fn = shard_map_conv(mesh, axis, causal, dilation)
    return fn(x, kernel)


@functools.lru_cache(maxsize=None)
def shard_map_conv(mesh: Mesh, axis: str, causal: bool, dilation: int):
    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, axis, None), P()),
        out_specs=P(None, axis, None),
    )
    def fn(x_local, kernel):
        return halo_conv1d(x_local, kernel, axis, causal, dilation)

    return jax.jit(fn)
