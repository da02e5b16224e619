"""Fused causal self-attention Pallas kernels for the transformer prior.

The TransformerPrior's stock XLA attention materializes the
(B, heads, T, T) logit/probability tensors in HBM through softmax —
forward AND backward (XLA keeps the probabilities as autodiff
residuals). At the flagship code-grid shape (T = 20*28 = 560, batch 32,
8 heads) that is ~320 MB per layer per direction, and the measured step
cost scales linearly with head count (3.4 ms at 1 head -> 23.3 ms at 8,
PERF.md "Flash attention for the transformer prior") while the matmul
FLOPs stay constant: the step is HBM-bound on attention traffic.

Kernel shape (chosen by measurement, not by GPU convention): code-grid
sequences are SHORT — T <= max_rows*max_cols = 4096, and the flagship
is 560 — so the whole per-(batch, head) problem fits VMEM. A
GPU-style flash kernel with a (BH, n_q, n_k) grid of 128x128 tiles ran
SLOWER than XLA here (30.6 vs 23.3 ms: thousands of tiny grid steps,
launch overhead dominated). Instead:

* grid = (B*heads,): one step owns one head's full sequence; K and V
  are VMEM-resident, Q is processed in statically-unrolled row tiles.
* Softmax rows (bq, kv_len) never leave VMEM; HBM sees only Q/K/V/O
  and the per-row logsumexp — O(T*D) traffic instead of O(T^2).
* The causal triangle is exploited with STATIC shapes: Q tile i only
  multiplies K[: (i+1)*bq], so the upper triangle costs nothing and
  every slice bound is a Python int (full Mosaic pipelining, no
  dynamic-bound fori_loop).
* backward is ONE kernel: per Q tile it recomputes P from Q and K,
  emits dQ, and accumulates dK/dV into VMEM scratch — no second
  recompute pass, no cross-step races (each grid step owns one bh).

T is padded to the tile size; padded KEY columns are masked to -1e30
and padded QUERY rows are harmless: their dO is zero-padded, which
zeroes their contribution to dK/dV exactly, and their O/dQ rows are
sliced off by the caller. The backward carries NO per-row side inputs:
(Tp, 1) lse/delta tiles lane-pad 1 -> 128 in VMEM (4.6 MB of waste at
T=2240), so the kernel recomputes the softmax normalizers from s
(bit-identical: same ops on the same operands) and derives
delta = rowsum(dO*O) from the resident O.

Used by models/transformer_prior.py on TPU; the stock XLA path remains
the fallback (CPU, and shapes whose VMEM estimate exceeds the budget)
and the parity oracle — tests run these kernels in interpreter mode.
Reference counterpart: the prior over VQ codes is the reference's
generative core (src/models.py:285-341); attention is this framework's
TPU-first replacement for its masked convolutions.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "causal_attention",
    "chunked_causal_attention",
    "flash_causal_attention",
    "flash_supported",
    "pick_block_q",
    "set_backend",
]

# Q row-tile size. 256 keeps the unroll count low at flagship T=560
# (3 tiles) while the (bq, kv) softmax block stays a few hundred KB.
BLOCK_Q = 256

_NEG = -1e30  # finite "masked" logit: avoids (-inf) - (-inf) = NaN

# "auto": fused kernels on TPU when the VMEM budget allows, stock XLA
# otherwise (tests override via set_backend).
_ATTN_BACKEND = "auto"  # auto | xla | flash


def set_backend(backend: str) -> None:
    """Select the attention implementation
    (auto | xla | flash | chunked)."""
    global _ATTN_BACKEND
    assert backend in ("auto", "xla", "flash", "chunked")
    _ATTN_BACKEND = backend


def _vmem_estimate(t: int, d: int, bq: int) -> int:
    """Backward-kernel VMEM scoped-stack model, calibrated against real
    Mosaic OOM reports: 5 double-buffered inputs (q, k, v, o, do) +
    3 double-buffered outputs + 2 scratch accumulators, all (Tp, D)
    f32, plus the live (bq, kv) f32 softmax-row intermediates.

    Calibration points (both at T=2240, d=64, from the earlier
    lse/delta-carrying kernel revision):
    * unrolled bq=256 (n_q=9, pre-split kernel): actual 19.55 MB =
      resident 9.4 + ~10.1 MB over sum_kv = 11520 rows -> ~0.86 live
      row-arrays per unrolled tile (Mosaic mostly reuses unrolled
      stack; model uses 2x for margin).
    * loop bq=64: ~7.4 MB of live row blocks beyond residency ->
      ~13 live (bq, Tp) arrays in the loop body (s, p, mask, dp, ds,
      dtype casts, accumulator temps; the loop body cannot share with
      the surrounding allocation) — model uses 14."""
    tp = -(-t // bq) * bq
    n_q = tp // bq
    resident = 20 * tp * d * 4
    if n_q <= _MAX_UNROLL:
        live = 2 * 4 * bq * (bq * n_q * (n_q + 1) // 2)
    else:
        live = 14 * 4 * bq * tp
    return resident + live


def pick_block_q(t: int, d: int):
    """Largest Q tile whose VMEM estimate fits under 14 MB of the 16 MB
    scoped budget; None when even the smallest tile does not fit."""
    for bq in (256, 128, 64, 32):
        if _vmem_estimate(t, d, bq) < 14 * 1024 * 1024:
            return bq
    return None


def flash_supported(t: int, d: int) -> bool:
    """True when some Q-tile size keeps the fused kernels inside VMEM."""
    return pick_block_q(t, d) is not None


def _mask(i, bq, kv, t_valid):
    """(bq, kv) causal+pad visibility for Q tile i (static shapes)."""
    q_pos = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, kv), 0)
    k_pos = jax.lax.broadcasted_iota(jnp.int32, (bq, kv), 1)
    return (k_pos <= q_pos) & (k_pos < t_valid)


# Above this many Q tiles the kernels switch from static unrolling to a
# fori_loop body: Mosaic does not reuse stack slots across unrolled
# iterations, so unrolled live memory grows ~quadratically with n_q
# (observed: fwd at T=2240/bq=64 = 35 unrolled tiles wanted 18.5 MB of
# the 16 MB scoped VMEM). The loop body computes full-width (bq, Tp)
# rows (it cannot shrink the causal triangle with dynamic shapes) but
# its intermediates are allocated once.
_MAX_UNROLL = 4


def _fwd_tile(i, kv, t_valid, scale, bq, q_ref, k_ref, v_ref, o_ref):
    """One Q row tile against keys [0:kv). i may be traced (loop mode)
    only when kv is the full padded width."""
    q = q_ref[0, pl.ds(i * bq, bq), :]
    k = k_ref[0, 0:kv, :]
    v = v_ref[0, 0:kv, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale                                 # (bq, kv) f32, VMEM-only
    s = jnp.where(_mask(i, bq, kv, t_valid), s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) / l
    o_ref[0, pl.ds(i * bq, bq), :] = o.astype(o_ref.dtype)


def _fwd_kernel(t_valid, scale, bq, n_q, q_ref, k_ref, v_ref, o_ref):
    """One (batch, head): K/V resident, Q in row tiles.

    q/k/v/o: (1, Tp, D). Small tile counts unroll statically with the
    causal triangle sliced away; large ones run a fori_loop body at
    full key width (see _MAX_UNROLL). No residuals beyond O: the
    backward recomputes the softmax normalizers per tile (cheaper than
    carrying (Tp, 1) rows, whose VMEM tiles lane-pad 1 -> 128)."""
    if n_q <= _MAX_UNROLL:
        for i in range(n_q):
            _fwd_tile(i, (i + 1) * bq, t_valid, scale, bq,
                      q_ref, k_ref, v_ref, o_ref)
    else:
        tp = k_ref.shape[1]

        def body(i, carry):
            _fwd_tile(i, tp, t_valid, scale, bq,
                      q_ref, k_ref, v_ref, o_ref)
            return carry

        jax.lax.fori_loop(0, n_q, body, 0)


def _bwd_tile(i, kv, t_valid, scale, bq, q_ref, k_ref, v_ref, o_ref,
              do_ref, dq_ref, dk_acc, dv_acc):
    """Backward for one Q row tile against keys [0:kv). Accumulates
    dK/dV into the scratch slices [0:kv); emits the dQ tile. The
    softmax normalizers are recomputed from s (bit-identical to the
    forward's, same ops on the same operands) and delta = rowsum(dO*O)
    comes from the resident O — no (Tp, 1) side inputs."""
    q = q_ref[0, pl.ds(i * bq, bq), :]
    # matmul operands stay in the input dtype (bf16 runs the MXU at
    # full rate; accumulation is f32 via preferred_element_type)
    do = do_ref[0, pl.ds(i * bq, bq), :]
    o = o_ref[0, pl.ds(i * bq, bq), :]
    delta = jnp.sum(
        do.astype(jnp.float32) * o.astype(jnp.float32),
        axis=1, keepdims=True)                    # (bq, 1)
    k = k_ref[0, 0:kv, :]
    v = v_ref[0, 0:kv, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s = jnp.where(_mask(i, bq, kv, t_valid), s, _NEG)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=1, keepdims=True)     # (bq, kv) f32
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - delta) * scale                 # (bq, kv) f32
    dq = jax.lax.dot_general(
        ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dq_ref[0, pl.ds(i * bq, bq), :] = dq.astype(dq_ref.dtype)
    dv_acc[0:kv, :] = dv_acc[0:kv, :] + jax.lax.dot_general(
        p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_acc[0:kv, :] = dk_acc[0:kv, :] + jax.lax.dot_general(
        ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(t_valid, scale, bq, n_q, q_ref, k_ref, v_ref, o_ref,
                do_ref, dq_ref, dk_ref, dv_ref, dk_acc, dv_acc):
    """dQ/dK/dV for one (batch, head) in a single pass.

    Per Q tile: recompute P from (Q, K, lse), emit the dQ tile, and
    accumulate dK/dV into f32 VMEM scratch. Padded Q rows contribute
    exactly zero to dK/dV because their dO rows are zero. Unroll-vs-
    loop split as in _fwd_kernel (see _MAX_UNROLL)."""
    dk_acc[:] = jnp.zeros_like(dk_acc)
    dv_acc[:] = jnp.zeros_like(dv_acc)
    if n_q <= _MAX_UNROLL:
        for i in range(n_q):
            _bwd_tile(i, (i + 1) * bq, t_valid, scale, bq,
                      q_ref, k_ref, v_ref, o_ref, do_ref,
                      dq_ref, dk_acc, dv_acc)
    else:
        tp = k_ref.shape[1]

        def body(i, carry):
            _bwd_tile(i, tp, t_valid, scale, bq,
                      q_ref, k_ref, v_ref, o_ref, do_ref,
                      dq_ref, dk_acc, dv_acc)
            return carry

        jax.lax.fori_loop(0, n_q, body, 0)
    dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
    dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _pad_t(x, tp):
    t = x.shape[1]
    if t == tp:
        return x
    return jnp.pad(x, ((0, 0), (0, tp - t), (0, 0)))


def _seq_spec(tp, d):
    return pl.BlockSpec((1, tp, d), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)


def _flash_fwd(q, k, v, scale, bq, interpret):
    """q/k/v: (BH, T, D). Returns o (BH, T, D)."""
    bh, t, d = q.shape
    tp = -(-t // bq) * bq
    n_q = tp // bq
    qp, kp, vp = _pad_t(q, tp), _pad_t(k, tp), _pad_t(v, tp)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, t, scale, bq, n_q),
        grid=(bh,),
        in_specs=[_seq_spec(tp, d)] * 3,
        out_specs=_seq_spec(tp, d),
        out_shape=jax.ShapeDtypeStruct((bh, tp, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return o[:, :t]


def _flash_bwd(q, k, v, o, do, scale, bq, interpret):
    bh, t, d = q.shape
    tp = -(-t // bq) * bq
    n_q = tp // bq
    qp, kp, vp = _pad_t(q, tp), _pad_t(k, tp), _pad_t(v, tp)
    # padded dO rows are zero, which zeroes the padded rows'
    # contribution to delta and to dK/dV inside the kernel
    op, dop = _pad_t(o, tp), _pad_t(do, tp)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, t, scale, bq, n_q),
        grid=(bh,),
        in_specs=[_seq_spec(tp, d)] * 5,
        out_specs=(_seq_spec(tp, d),) * 3,
        out_shape=(jax.ShapeDtypeStruct((bh, tp, d), q.dtype),) * 3,
        scratch_shapes=[
            pltpu.VMEM((tp, d), jnp.float32),
            pltpu.VMEM((tp, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)
        ),
        interpret=interpret,
    )(qp, kp, vp, op, dop)
    return dq[:, :t], dk[:, :t], dv[:, :t]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_causal_attention(q, k, v, scale, bq=BLOCK_Q, interpret=False):
    """Causal softmax(Q K^T * scale) V without materializing (T, T) in
    HBM.

    q/k/v: (BH, T, D); returns (BH, T, D) in q.dtype. Differentiable
    (single-pass fused backward that recomputes the softmax from Q/K —
    the only saved residual beyond the inputs is O). ``interpret=True``
    runs the kernels in the Pallas interpreter (the CPU parity-test
    path)."""
    return _flash_fwd(q, k, v, scale, bq, interpret)


def _flash_vjp_fwd(q, k, v, scale, bq, interpret):
    o = _flash_fwd(q, k, v, scale, bq, interpret)
    return o, (q, k, v, o)


def _flash_vjp_bwd(scale, bq, interpret, res, do):
    q, k, v, o = res
    dq, dk, dv = _flash_bwd(q, k, v, o, do, scale, bq, interpret)
    return dq, dk, dv


flash_causal_attention.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def chunked_causal_attention(q, k, v, scale, block: int = 320):
    """Linear-memory causal attention in plain XLA: online softmax over
    KV chunks inside a q-block scan, with each q-block rematerialized in
    the backward (``jax.checkpoint``), so NO (T, T) probability tensor
    is ever stored — the long-T fix for the hier-bottom grid, where the
    stock path's O(T^2) softmax residuals (2.5 GB at T=2240) made the
    step HBM-bound (102 ms fwd+bwd) and the fused kernel's VMEM budget
    starved the MXU (151 ms). Numerics match `_xla_causal_attention` to
    f32 tolerance (same max-subtract softmax, f32 accumulation);
    backward costs one extra forward recompute per q block.

    q/k/v: (B, H, T, D) -> (B, H, T, D)."""
    b, h, t, d = q.shape
    nb = -(-t // block)
    tp = nb * block

    def padt(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))

    kb = padt(k).reshape(b, h, nb, block, d)
    vb = padt(v).reshape(b, h, nb, block, d)
    qb = padt(q).reshape(b, h, nb, block, d)
    kpos_all = jnp.arange(tp).reshape(nb, block)
    neg = jnp.float32(-1e30)  # finite -inf: keeps exp()=0 without NaNs

    @jax.checkpoint
    def one_q_block(i, qi):
        qpos = i * block + jnp.arange(block)

        def inner(carry, j):
            # deliberately UNIFORM over all nb KV blocks, with the
            # upper triangle handled by masking: wrapping the body in
            # lax.cond(j <= i, ...) to skip the dead half was measured
            # SLOWER (135 vs 78 ms fwd+bwd at T=2240 — the branch
            # defeats XLA's scan pipelining and doubles the backward's
            # control flow), so the ~2x masked FLOPs stay (they are
            # cheap relative to the traffic this path exists to avoid)
            m, l, acc = carry
            kj = jax.lax.dynamic_index_in_dim(kb, j, 2, keepdims=False)
            vj = jax.lax.dynamic_index_in_dim(vb, j, 2, keepdims=False)
            s = jnp.einsum(
                "bhqd,bhkd->bhqk", qi, kj,
                preferred_element_type=jnp.float32,
            ) * scale
            kpos = jax.lax.dynamic_index_in_dim(
                kpos_all, j, 0, keepdims=False
            )
            mask = (qpos[:, None] >= kpos[None, :]) & (kpos < t)[None, :]
            s = jnp.where(mask[None, None], s, neg)
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc_new = acc * corr + jnp.einsum(
                "bhqk,bhkd->bhqd", p.astype(v.dtype), vj,
                preferred_element_type=jnp.float32,
            )
            return (m_new, l_new, acc_new), None

        m0 = jnp.full((b, h, block, 1), neg, jnp.float32)
        l0 = jnp.zeros((b, h, block, 1), jnp.float32)
        a0 = jnp.zeros((b, h, block, d), jnp.float32)
        (m, l, acc), _ = jax.lax.scan(
            inner, (m0, l0, a0), jnp.arange(nb)
        )
        return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

    def outer(_, i):
        qi = jax.lax.dynamic_index_in_dim(qb, i, 2, keepdims=False)
        return None, one_q_block(i, qi)

    _, ob = jax.lax.scan(outer, None, jnp.arange(nb))
    # ob: (nb, b, h, block, d) -> (b, h, tp, d) -> trim padding
    o = jnp.moveaxis(ob, 0, 2).reshape(b, h, tp, d)
    return o[:, :, :t, :]


def _xla_causal_attention(q, k, v, scale):
    """Stock XLA path (the parity oracle): explicit masked softmax.
    q/k/v: (B, H, T, D) -> (B, H, T, D)."""
    t = q.shape[2]
    s = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32,
    ) * scale
    mask = jnp.tril(jnp.ones((t, t), bool))
    s = jnp.where(mask, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v)


def causal_attention(q, k, v, scale=None, interpret=False):
    """Multi-head causal attention with automatic backend dispatch.

    q/k/v: (B, H, T, D). On TPU (or with the 'flash' backend forced)
    runs the fused Pallas kernels when the sequence fits the VMEM
    budget; otherwise the stock XLA path."""
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])
    b, h, t, d = q.shape
    bq = pick_block_q(t, d)
    use_flash = _ATTN_BACKEND == "flash" and bq is not None
    if _ATTN_BACKEND == "chunked":
        # opt-in linear-MEMORY path: no O(T^2) residuals, bounded VMEM.
        # Measured SLOWER than stock XLA at the hier-bottom T=2240
        # (78 vs 61 ms fwd+bwd, interleaved medians — PERF.md "long-T
        # chunked attention"), so auto never picks it; its value is
        # memory headroom at sequence lengths where the stock path's
        # T^2 residuals no longer fit, not speed.
        return chunked_causal_attention(q, k, v, scale)
    if _ATTN_BACKEND == "auto" and jax.default_backend() == "tpu":
        # measured policy (PERF.md head-width sweep + T=2240 re-check):
        # the fused kernel wins 1.3-1.6x below 128-wide heads WHEN the
        # VMEM budget admits >=128-row Q tiles; at hd=128/short T the
        # stock XLA path keeps a ~3% edge, and at long T (T=2240/hd64,
        # bq=32) the round-4 interleaved re-measure puts the residual-
        # free fused backward at parity with stock (59.8 vs 60.9 ms) —
        # auto keeps stock there (no win to justify the kernel)
        use_flash = bq is not None and bq >= 128 and d < 128
    if not use_flash:
        return _xla_causal_attention(q, k, v, scale)
    flat = lambda x: x.reshape(b * h, t, d)
    o = flash_causal_attention(
        flat(q), flat(k), flat(v), float(scale), bq,
        interpret=interpret)
    return o.reshape(b, h, t, d)
