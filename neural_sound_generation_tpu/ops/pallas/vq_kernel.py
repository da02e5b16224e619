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

# Tiled-codebook path (quantize_channels-scale K, e.g. 65536, and RVQ
# stages): the codebook streams through VMEM in (D, TILE_K) column blocks.
# A naive per-block argmin is VPU-bound on the cross-lane reduction (5.7
# ms at N=8192 K=65536 on v5e), so the reduction is deferred: each k step
# only updates an elementwise running (min, k-tile id) pair in VMEM
# scratch (full-rate VPU ops), and the single cross-lane argmin over
# TILE_K columns runs once per row tile on the last k step (4.0 ms same
# shape — measured; see PERF.md "VQ kernel at quantize_channels scale").
TILE_N_BIG = 1024
TILE_K = 512


def _vq_kernel(x_ref, cbt_ref, cbsq_ref, idx_ref):
    # x: (TILE_N, D); cbt: (D, K); cbsq: (1, K)
    x = x_ref[:]
    # MXU: -2 x @ e^T, plus the per-code norm (VPU broadcast add)
    scores = cbsq_ref[:] - 2.0 * jnp.dot(
        x, cbt_ref[:], preferred_element_type=jnp.float32
    )
    idx_ref[:] = jnp.argmin(scores, axis=1).astype(jnp.int32)


def _vq_kernel_tiled(n_ksteps, x_ref, cbt_ref, cbsq_ref, idx_ref,
                     bv_ref, bk_ref):
    # Grid (n_tiles, k_tiles), k innermost. x: (TILE_N_BIG, D) resident
    # for all k steps of a row tile; cbt: (D, TILE_K) streamed. Scratch:
    # bv/bk hold, per (row, column-within-tile) position, the elementwise
    # running minimum across k tiles and the k-tile id that produced it.
    kstep = pl.program_id(1)
    scores = cbsq_ref[:] - 2.0 * jnp.dot(
        x_ref[:], cbt_ref[:], preferred_element_type=jnp.float32
    )

    @pl.when(kstep == 0)
    def _init():
        bv_ref[:] = scores
        bk_ref[:] = jnp.zeros_like(bk_ref)

    @pl.when(kstep > 0)
    def _update():
        # strict < keeps the earliest k tile on exact ties
        take = scores < bv_ref[:]
        bv_ref[:] = jnp.minimum(scores, bv_ref[:])
        bk_ref[:] = jnp.where(take, kstep, bk_ref[:])

    @pl.when(kstep == n_ksteps - 1)
    def _finish():
        # one cross-lane argmin per row tile; gather the winning k tile
        # via a one-hot sum (no dynamic cross-lane indexing on TPU)
        bv = bv_ref[:]
        col = jnp.argmin(bv, axis=1).astype(jnp.int32)
        onehot = jax.lax.broadcasted_iota(jnp.int32, bv.shape, 1) == col[:, None]
        ksel = jnp.sum(jnp.where(onehot, bk_ref[:], 0), axis=1)
        idx_ref[:] = ksel * TILE_K + col


def _fits_single_pass(d: int, k: int) -> bool:
    vmem_bytes = 4 * (TILE_N * d + d * k + k + TILE_N * k)
    return vmem_bytes < 12 * 1024 * 1024


def pallas_supported(n: int, d: int, k: int) -> bool:
    """Capability check: lane-aligned D/K, and either a codebook that fits
    VMEM whole (single-pass kernel) or a feature dim small enough that one
    (TILE_N_BIG, D) input tile plus one (D, TILE_K) codebook block plus
    the running-min scratch fit (K-tiled kernel — any K)."""
    if d % 128 != 0 or k % 128 != 0:
        return False
    if _fits_single_pass(d, k):
        return True
    tiled_bytes = 4 * (
        TILE_N_BIG * d + d * TILE_K + TILE_K + 3 * TILE_N_BIG * TILE_K
    )
    return tiled_bytes < 12 * 1024 * 1024


def pallas_preferred(n: int, d: int, k: int) -> bool:
    """Dispatch policy for the 'auto' backend: use the Pallas kernel only
    where it measures faster than XLA on v5e. The single-pass kernel wins
    at VMEM-resident K; at quantize_channels scale (K=65536) XLA's fused
    expansion keeps a ~1.3x edge over the K-tiled kernel (it fuses the
    argmin reduction into the matmul epilogue — it does NOT materialize
    the (N, K) matrix under jit), so auto keeps XLA there. Measurements:
    PERF.md "VQ kernel at quantize_channels scale"."""
    return pallas_supported(n, d, k) and _fits_single_pass(d, k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_codebook_indices(
    inputs_flat: jnp.ndarray, codebook: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(N, D) x (K, D) -> (N,) int32 nearest-code indices.

    VMEM-resident K runs the single-pass kernel (exact jnp.argmin
    semantics incl. first-occurrence ties). Larger K runs the K-tiled
    kernel, whose tie-break differs on *exact* distance ties spanning
    k tiles: it returns a minimizing index (earliest column, then
    earliest k tile), not necessarily the globally first one."""
    n, d = inputs_flat.shape
    k = codebook.shape[0]
    if not _fits_single_pass(d, k):
        return _nearest_tiled(inputs_flat, codebook, interpret)
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


def _nearest_tiled(
    inputs_flat: jnp.ndarray, codebook: jnp.ndarray, interpret: bool
) -> jnp.ndarray:
    n, d = inputs_flat.shape
    k = codebook.shape[0]
    n_pad = (TILE_N_BIG - n % TILE_N_BIG) % TILE_N_BIG
    x = jnp.pad(inputs_flat, ((0, n_pad), (0, 0)))
    k_pad = (TILE_K - k % TILE_K) % TILE_K
    cbt = jnp.pad(codebook.T, ((0, 0), (0, k_pad)))  # (D, K')
    cbsq = jnp.sum(codebook**2, axis=1)[None, :]  # (1, K)
    # padded codes must never win the argmin: give them an infinite norm
    cbsq = jnp.pad(cbsq, ((0, 0), (0, k_pad)), constant_values=jnp.inf)

    n_ksteps = cbt.shape[1] // TILE_K
    grid = (x.shape[0] // TILE_N_BIG, n_ksteps)
    out = pl.pallas_call(
        functools.partial(_vq_kernel_tiled, n_ksteps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (TILE_N_BIG, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, TILE_K), lambda i, j: (0, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, TILE_K), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TILE_N_BIG,), lambda i, j: (i,), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((x.shape[0],), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((TILE_N_BIG, TILE_K), jnp.float32),
            pltpu.VMEM((TILE_N_BIG, TILE_K), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")
        ),
        interpret=interpret,
    )(x, cbt, cbsq)
    return out[:n]
