"""Fused nearest-codebook Pallas kernel.

The VQ hot loop is argmin_k ||x_n - e_k||^2 over (N, D) inputs and (K, D)
codes (the reference computes the full (N, K) distance matrix with one
addmm then argmins it, src/vector_quantization.py:12-19). On TPU the
XLA path materializes that (N, K) matrix in HBM; this kernel keeps
everything in VMEM: per N-tile, one MXU matmul against the resident
codebook + a VPU argmin, writing only the (N,) winner indices.

Two algebraic simplifications:
  * ||x||^2 is constant per row — it never changes the argmin, so only
    ||e||^2 - 2 x.e^T is computed.
  * the winner search runs on the fused (TILE_N, K) block in registers/
    VMEM; the distance matrix never reaches HBM.

Used by ops/vq.py when running on TPU with compatible shapes; the XLA
expansion remains the fallback (and the CPU test path runs this kernel in
interpreter mode for parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# The 1-D int32 index output must tile in multiples of 1024 (XLA T(1024)
# layout; smaller blocks fail Mosaic layout verification on v5e). 2048
# measured fastest on v5e: ~20us/call for the flagship (26880, 256) x
# (512, 256) workload vs ~24us for the fused XLA expansion; the gap grows
# with K since XLA materializes the (N, K) distance matrix.
TILE_N = 2048


def _vq_kernel(x_ref, cbt_ref, cbsq_ref, idx_ref):
    # x: (TILE_N, D); cbt: (D, K); cbsq: (1, K)
    x = x_ref[:]
    # MXU: -2 x @ e^T, plus the per-code norm (VPU broadcast add)
    scores = cbsq_ref[:] - 2.0 * jnp.dot(
        x, cbt_ref[:], preferred_element_type=jnp.float32
    )
    idx_ref[:] = jnp.argmin(scores, axis=1).astype(jnp.int32)


def pallas_supported(n: int, d: int, k: int) -> bool:
    """Shape constraints for the TPU kernel: lane-aligned D and K, and a
    codebook that comfortably fits VMEM alongside one input tile."""
    if d % 128 != 0 or k % 128 != 0:
        return False
    vmem_bytes = 4 * (TILE_N * d + d * k + k + TILE_N * k)
    return vmem_bytes < 12 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codebook_indices(
    inputs_flat: jnp.ndarray, codebook: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, D) x (K, D) -> (N,) int32 nearest-code indices."""
    n, d = inputs_flat.shape
    k = codebook.shape[0]
    n_pad = (TILE_N - n % TILE_N) % TILE_N
    x = jnp.pad(inputs_flat, ((0, n_pad), (0, 0)))
    cbt = codebook.T  # (D, K)
    cbsq = jnp.sum(codebook**2, axis=1)[None, :]  # (1, K)

    grid = (x.shape[0] // TILE_N,)
    out = pl.pallas_call(
        _vq_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_N, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N,), lambda i: (i,), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((x.shape[0],), jnp.int32),
        interpret=interpret,
    )(x, cbt, cbsq)
    return out[:n]
