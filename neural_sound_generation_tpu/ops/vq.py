"""Vector quantization with straight-through gradients.

Rebuilds the reference's custom autograd Functions
(``src/vector_quantization.py``):

  * ``vq(inputs, codebook)`` — nearest-codebook indices via the
    ||x||^2 + ||e||^2 - 2 x.e^T distance expansion (reference computes it
    with one ``addmm``, vector_quantization.py:12-19). Non-differentiable.
  * ``vq_st(inputs, codebook)`` — codes + indices with a straight-through
    estimator: encoder grad is the upstream grad passed through unchanged
    (vector_quantization.py:50-52); codebook grad is the scatter-add of
    upstream grads by code index (``index_add_`` semantics,
    vector_quantization.py:53-61), realized here as ``segment_sum``.

TPU notes: the distance term ``x @ e^T`` is a large (N, D) x (D, K) matmul
that maps straight onto the MXU; argmin is a VPU reduction. On TPU the
fused Pallas kernel in ``ops/pallas/vq_kernel.py`` computes distances tile
by tile in VMEM without materializing the (N, K) distance matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# "auto": fused Pallas kernel on TPU when shapes allow, XLA otherwise.
_VQ_BACKEND = "auto"  # auto | xla | pallas


def set_vq_backend(backend: str) -> None:
    """Select the nearest-codebook implementation (auto | xla | pallas)."""
    global _VQ_BACKEND
    assert backend in ("auto", "xla", "pallas")
    _VQ_BACKEND = backend


# jit matters beyond speed: compiled, XLA fuses the argmin into the
# matmul epilogue, so the (N, K) distance matrix never reaches HBM; the
# eager expansion materializes it (7 GB at N=26880, K=65536 -> OOM).
# Under an outer jit this inlines as a plain call.
@jax.jit
def _nearest_indices_xla(inputs_flat: jnp.ndarray, codebook: jnp.ndarray):
    codebook_sqr = jnp.sum(codebook**2, axis=1)  # (K,)
    inputs_sqr = jnp.sum(inputs_flat**2, axis=1, keepdims=True)  # (N, 1)
    # (N, K) distances; the -2 x e^T term is the MXU matmul.
    distances = (
        codebook_sqr[None, :]
        + inputs_sqr
        - 2.0
        * jnp.dot(inputs_flat, codebook.T, preferred_element_type=jnp.float32)
    )
    return jnp.argmin(distances, axis=1).astype(jnp.int32)


def _nearest_indices(inputs_flat: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Argmin_k ||x - e_k||^2 for (N, D) inputs and (K, D) codebook."""
    n, d = inputs_flat.shape
    k = codebook.shape[0]
    use_pallas = _VQ_BACKEND == "pallas"
    if _VQ_BACKEND == "auto" and jax.default_backend() == "tpu":
        from neural_sound_generation_tpu.ops.pallas.vq_kernel import pallas_preferred

        use_pallas = pallas_preferred(n, d, k)
    if use_pallas:
        from neural_sound_generation_tpu.ops.pallas.vq_kernel import (
            nearest_codebook_indices,
        )

        return nearest_codebook_indices(
            inputs_flat, codebook, interpret=jax.default_backend() != "tpu"
        )
    return _nearest_indices_xla(inputs_flat, codebook)


def vq(inputs: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook indices, shaped ``inputs.shape[:-1]``.

    Like the reference ``vq``, this path carries no gradient: it is wrapped
    in ``stop_gradient`` (the reference raises on backward,
    vector_quantization.py:26-30; in JAX the honest equivalent is a zero
    cotangent on a discrete output).
    """
    embedding_size = codebook.shape[1]
    inputs_flat = jnp.reshape(inputs, (-1, embedding_size))
    indices = _nearest_indices(
        jax.lax.stop_gradient(inputs_flat), jax.lax.stop_gradient(codebook)
    )
    return jnp.reshape(indices, inputs.shape[:-1])


@jax.custom_vjp
def vq_st(inputs: jnp.ndarray, codebook: jnp.ndarray):
    """Straight-through vector quantization.

    Returns ``(codes, indices_flat)`` exactly like the reference ``vq_st``
    (vector_quantization.py:32-44): ``codes`` has the shape of ``inputs``;
    ``indices_flat`` is the flattened int32 code ids.
    """
    embedding_size = codebook.shape[1]
    inputs_flat = jnp.reshape(inputs, (-1, embedding_size))
    indices_flat = _nearest_indices(inputs_flat, codebook)
    codes_flat = jnp.take(codebook, indices_flat, axis=0)
    codes = jnp.reshape(codes_flat, inputs.shape)
    return codes, indices_flat


def _vq_st_fwd(inputs, codebook):
    codes, indices_flat = vq_st(inputs, codebook)
    return (codes, indices_flat), (indices_flat, codebook.shape[0])


# One-hot beyond this many bytes would dominate HBM; fall back to the
# scatter lowering (e.g. quantize_channels-scale codebooks: N=26880 x
# K=65536 would be a 7 GB one-hot).
_ONEHOT_GRAD_MAX_BYTES = 256 * 1024 * 1024


def _sum_rows_by_code(rows_flat, indices_flat, num_codes):
    """sum of ``rows_flat[i]`` into row ``indices_flat[i]`` of a
    (num_codes, D) result — the codebook-gradient / cluster-sum pattern.

    TPU-native lowering: a (N, K) one-hot times (N, D) matmul on the MXU
    at HIGHEST precision (f32-exact accumulation; matches segment_sum to
    float-sum reordering, ~1e-4 at flagship scale). XLA lowers
    ``segment_sum`` / the ``take`` VJP to scatter here, which costs the
    flagship train step 0.17 ms more per step — one-hot matmul measures
    +6.6% whole-step throughput (PERF.md round-3 attribution). Large
    (N x K) one-hots fall back to segment_sum."""
    n = rows_flat.shape[0]
    if n * num_codes * 4 > _ONEHOT_GRAD_MAX_BYTES:
        # accumulate in f32 like the one-hot path's preferred_element_type:
        # segment_sum returns the INPUT dtype, and bf16 represents integers
        # exactly only up to 256 — popular codes' cluster counts (the ones
        # column codebook_ema_update prepends) would round otherwise
        return jax.ops.segment_sum(
            rows_flat.astype(jnp.float32), indices_flat,
            num_segments=num_codes,
        )
    onehot = (
        indices_flat[:, None] == jnp.arange(num_codes)[None, :]
    ).astype(rows_flat.dtype)
    return jnp.dot(
        onehot.T,
        rows_flat,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _vq_st_bwd(residuals, cotangents):
    indices_flat, num_codes = residuals
    grad_codes, _ = cotangents  # cotangent on int indices is float0 — ignored
    # Straight-through: encoder receives the upstream grad unchanged.
    grad_inputs = grad_codes
    # Codebook: upstream grads summed into the selected rows (reference
    # index_add_, vector_quantization.py:60-61) via the MXU one-hot path.
    embedding_size = grad_codes.shape[-1]
    grad_flat = jnp.reshape(grad_codes, (-1, embedding_size))
    grad_codebook = _sum_rows_by_code(grad_flat, indices_flat, num_codes)
    return grad_inputs, grad_codebook


vq_st.defvjp(_vq_st_fwd, _vq_st_bwd)


@jax.custom_vjp
def codebook_lookup(codebook: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Differentiable embedding lookup: grads flow to the codebook with
    scatter-add SEMANTICS (the reference's second ``index_select``
    against the non-detached weight, models.py:137-141), lowered as the
    one-hot MXU matmul (``_sum_rows_by_code``) instead of the scatter
    XLA emits for the plain ``take`` VJP."""
    return jnp.take(codebook, indices, axis=0)


def _codebook_lookup_fwd(codebook, indices):
    return jnp.take(codebook, indices, axis=0), (indices, codebook.shape[0])


def _codebook_lookup_bwd(residuals, cotangent):
    indices, num_codes = residuals
    embedding_size = cotangent.shape[-1]
    grad = _sum_rows_by_code(
        jnp.reshape(cotangent, (-1, embedding_size)),
        jnp.reshape(indices, (-1,)),
        num_codes,
    )
    return grad, None


codebook_lookup.defvjp(_codebook_lookup_fwd, _codebook_lookup_bwd)


def codebook_ema_update(
    codebook: jnp.ndarray,
    cluster_size_ema: jnp.ndarray,
    embed_sum_ema: jnp.ndarray,
    inputs_flat: jnp.ndarray,
    indices_flat: jnp.ndarray,
    decay: float,
    eps: float = 1e-5,
):
    """EMA codebook update (VQ-VAE-2 style), optional alternative to
    gradient-descent codebook learning (ModelConfig.ema_codebook).

    Returns (new_codebook, new_cluster_size_ema, new_embed_sum_ema). Under
    data parallelism, call inside pjit/shard_map: the segment sums below are
    batch reductions and compile to ICI all-reduces automatically.
    """
    num_codes = codebook.shape[0]
    # counts + per-code sums in ONE one-hot matmul: [1 | x] summed by code
    both = _sum_rows_by_code(
        jnp.concatenate(
            [jnp.ones((inputs_flat.shape[0], 1), inputs_flat.dtype),
             inputs_flat],
            axis=1,
        ),
        indices_flat,
        num_codes,
    )
    one_hot_counts = both[:, 0]
    embed_sums = both[:, 1:]

    new_cluster = decay * cluster_size_ema + (1 - decay) * one_hot_counts
    new_embed_sum = decay * embed_sum_ema + (1 - decay) * embed_sums

    n = jnp.sum(new_cluster)
    cluster = (new_cluster + eps) / (n + num_codes * eps) * n
    new_codebook = new_embed_sum / cluster[:, None]
    return new_codebook, new_cluster, new_embed_sum


def residual_vq(inputs: jnp.ndarray, codebooks: jnp.ndarray):
    """Residual vector quantization (SoundStream-style multi-stage VQ).

    ``codebooks``: (Q, K, D) — Q quantizer stages. Each stage quantizes the
    residual left by the previous stages; the final quantized vector is the
    sum of the per-stage codes. Gradient wiring:
      * encoder receives the upstream grad once via a single
        straight-through around the full sum,
      * each stage's codebook receives grads through its own
        differentiable lookup (scatter-add semantics, as in single-stage
        ``vq_st``).

    Returns (quantized_st, quantized_sum, indices) with
      quantized_st : inputs + sg(sum - inputs)  — feed the decoder
      quantized_sum: grads flow to every codebook — use in the vq loss
      indices      : (Q, N) int32 per-stage assignments.

    Beyond-parity feature: the reference has a single codebook only; RVQ
    refines reconstruction at ~Q x the bitrate with the same decoder.
    """
    num_q = codebooks.shape[0]
    embedding_size = codebooks.shape[-1]
    flat = jnp.reshape(inputs, (-1, embedding_size))
    residual = jax.lax.stop_gradient(flat)
    total = jnp.zeros_like(flat)
    indices = []
    for q in range(num_q):
        idx = _nearest_indices(residual, jax.lax.stop_gradient(codebooks[q]))
        codes = codebook_lookup(codebooks[q], idx)  # grads -> codebook q
        total = total + codes
        residual = residual - jax.lax.stop_gradient(codes)
        indices.append(idx)
    quantized_sum = jnp.reshape(total, inputs.shape)
    quantized_st = inputs + jax.lax.stop_gradient(quantized_sum - inputs)
    return quantized_st, quantized_sum, jnp.stack(indices)


def restart_dead_codes(
    codebook: jnp.ndarray,
    usage: jnp.ndarray,
    batch_flat: jnp.ndarray,
    key: jax.Array,
    threshold: float = 1.0,
    cluster: jnp.ndarray = None,
    embed_sum: jnp.ndarray = None,
):
    """Reinitialize unused codes from random encoder outputs.

    The standard codebook-collapse mitigation (observed in practice: toy
    runs collapse to perplexity ~1): codes whose ``usage`` (e.g. EMA
    cluster size or batch counts) falls below ``threshold`` are replaced
    by randomly drawn rows of the current batch's encoder outputs. Fully
    static shapes — a (K,) where-select, jit/pjit safe.

    Under EMA codebook learning, pass the EMA statistics (``cluster``,
    ``embed_sum``) and use the returned 3-tuple: the next
    ``codebook_ema_update`` recomputes every row as
    ``new_embed_sum / smoothed_cluster``, so WITHOUT resetting the stats
    the stale sums immediately revert a restarted row to ~its old dead
    value (and the code is re-randomized every step, never curing the
    collapse). Restarted rows restart their statistics as one
    observation of the new vector: ``cluster = 1``,
    ``embed_sum = candidate``.
    """
    num_codes = codebook.shape[0]
    idx = jax.random.randint(key, (num_codes,), 0, batch_flat.shape[0])
    candidates = jax.lax.stop_gradient(batch_flat[idx])
    dead_row = usage < threshold
    dead = dead_row[:, None]
    new_cb = jnp.where(dead, candidates.astype(codebook.dtype), codebook)
    if cluster is None:
        return new_cb
    new_cluster = jnp.where(dead_row, jnp.ones_like(cluster), cluster)
    new_esum = jnp.where(dead, candidates.astype(embed_sum.dtype), embed_sum)
    return new_cb, new_cluster, new_esum


def residual_codebook_ema_update(
    codebooks: jnp.ndarray,
    cluster_size_ema: jnp.ndarray,
    embed_sum_ema: jnp.ndarray,
    inputs_flat: jnp.ndarray,
    indices: jnp.ndarray,
    decay: float,
    eps: float = 1e-5,
    return_residuals: bool = False,
):
    """Per-stage EMA update for residual VQ.

    ``codebooks``: (Q, K, D); ``cluster_size_ema``: (Q, K);
    ``embed_sum_ema``: (Q, K, D); ``indices``: (Q, N) stage assignments
    from ``residual_vq``. Stage q's statistics are computed against the
    *residual* its quantizer saw (inputs minus the codes selected by the
    earlier stages), reconstructed here from the indices.

    ``return_residuals=True`` appends the (Q, N, D) per-stage residual
    inputs to the result — the correct candidate pool for per-stage
    dead-code restarts (raw encoder outputs are at a different scale
    than stage-1+ residuals, so a code restarted from them never wins an
    assignment).
    """
    num_q = codebooks.shape[0]
    residual = inputs_flat
    new_cbs, new_clusters, new_sums, residuals = [], [], [], []
    for q in range(num_q):
        residuals.append(residual)
        cb, cl, es = codebook_ema_update(
            codebooks[q],
            cluster_size_ema[q],
            embed_sum_ema[q],
            residual,
            indices[q],
            decay,
            eps,
        )
        new_cbs.append(cb)
        new_clusters.append(cl)
        new_sums.append(es)
        residual = residual - jnp.take(codebooks[q], indices[q], axis=0)
    out = (
        jnp.stack(new_cbs),
        jnp.stack(new_clusters),
        jnp.stack(new_sums),
    )
    if return_residuals:
        return out + (jnp.stack(residuals),)
    return out


def data_codebook_init(
    z_e: jnp.ndarray,
    codebook_shape,
    key,
    noise_scale: float = 0.01,
) -> jnp.ndarray:
    """Seed a codebook from ENCODER OUTPUTS instead of U(+-1/K) around
    the origin (the Jukebox-style random-sample init).

    The reference's uniform init (models.py:125) puts every code in a
    tiny ball at the origin; when the encoder's output distribution
    lands elsewhere, only the few codes nearest the data ever win the
    argmin and the rest never receive gradient/EMA mass — the collapse
    the round-5 wave soak measured (8-9 of 512 codes live). Drawing the
    initial rows from ``z_e`` itself starts every code inside the data
    distribution.

    ``z_e``: (..., D) encoder outputs from one or more warmup batches.
    ``codebook_shape``: (K, D) or (Q, K, D) for residual VQ — stage q>0
    is seeded from the RESIDUALS after greedy assignment to the
    already-seeded earlier stages, matching what it will quantize.
    Rows get ``noise_scale * std`` jitter so duplicate draws split."""
    flat = jnp.reshape(z_e, (-1, z_e.shape[-1])).astype(jnp.float32)
    if len(codebook_shape) == 2:
        qs, (k, d) = 1, codebook_shape
    else:
        qs, k, d = codebook_shape
    assert d == flat.shape[-1], (codebook_shape, flat.shape)

    def sample_rows(x, kq):
        k_idx, k_noise = jax.random.split(kq)
        idx = jax.random.choice(
            k_idx, x.shape[0], (k,), replace=x.shape[0] < k
        )
        rows = jnp.take(x, idx, axis=0)
        std = jnp.std(x) + 1e-6
        return rows + noise_scale * std * jax.random.normal(
            k_noise, rows.shape
        )

    if qs == 1:
        return sample_rows(flat, key)
    books, residual = [], flat
    for q in range(qs):
        book = sample_rows(residual, jax.random.fold_in(key, q))
        books.append(book)
        idx = vq(residual[None], book)[0]
        residual = residual - jnp.take(book, idx, axis=0)
    return jnp.stack(books)
