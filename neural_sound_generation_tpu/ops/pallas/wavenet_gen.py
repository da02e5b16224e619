"""Fused WaveNet autoregressive-generation kernel (single stream).

STATUS — opt-in experiment, NOT the production path. Measured on a
v5e: this kernel lands at 70-95 us/step across every data-movement
strategy tried (single-rotate ring, group-masked circular indexing,
plane-indexed ring with one read per unique dilation offset, cached
conditioning blocks), while the unrolled XLA scan sampler
(models/wavenet.make_generate_fn, unroll=8) does the same step in
~46 us — the batch-1 residual chain is latency-bound on single-sublane
VMEM accesses (~0.5 us each) that Mosaic cannot hoist, whereas XLA's
scan pipelines them across unrolled steps. The kernel is kept for its
teacher-forced parity harness and as the measured record of the
experiment; ``make_generate_fn(use_pallas=True)`` still dispatches
here for qualifying shapes.

This kernel runs the ENTIRE generation loop inside one ``pallas_call``:

  * all stacked layer weights live in VMEM for the whole loop (zero HBM
    weight traffic per step; ~7 MB bf16 at the 24-layer/128-channel
    production config, comfortably inside the ~16 MB core VMEM),
  * the dilation state is a circular (L, rmax, R) VMEM ring indexed with
    ``t mod rmax`` — no per-step buffer shifting at all,
  * the mixture-of-logistics head samples in-lane: gumbel-max mixture
    choice and the inverse-CDF logistic both run as masked VPU ops on the
    128-lane logits row (no cross-lane gathers),
  * noise comes from the hardware PRNG (``pltpu.prng_*``) — the serial
    threefry split chain that costs ~8 us/step under XLA disappears.

Per step that leaves ~(3K-1)·L MXU matmuls issued back-to-back plus a few
VPU gate ops — the data-dependent residual chain, which is the true
serial floor of the model.

Supported shapes (``pallas_generate_supported``): scalar-input MoL
output, batch 1, local conditioning only, gate/residual/skip channels in
multiples of 128, and weights small enough to be VMEM-resident. The XLA
scan path remains the general fallback.

A teacher-forced variant (``pallas_teacher_logits``) feeds given inputs
instead of the sampled feedback and emits the per-step logits — the
bit-level parity check against ``WaveNet.incremental_forward``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neural_sound_generation_tpu.models.wavenet import (
    _LOG_SCALE_MIN as LOG_SCALE_MIN,  # ONE MoL floor for every sampler
)
_P = 128  # lane width; the MoL head must fit in one lane row


def _vmem_bytes(model) -> int:
    L = model.layers
    K = model.kernel_size
    R = model.residual_channels
    G = model.gate_channels
    S = model.skip_out_channels
    C = max(model.cin_channels, 0)
    return 2 * (
        (K - 1) * L * R * G  # taps
        + L * R * G          # current
        + L * (G // 2) * R   # res
        + L * (G // 2) * S   # skip
        + C * L * G          # cond (flattened)
    )


def pallas_generate_supported(model, batch_size: int) -> bool:
    """Shapes this kernel handles; callers fall back to the XLA scan."""
    return (
        batch_size == 1
        and model.scalar_input
        and model.out_channels % 3 == 0
        and model.out_channels <= _P
        and model.cin_channels > 0
        and model.gin_channels <= 0
        and model.residual_channels % _P == 0
        and model.gate_channels % (2 * _P) == 0
        and model.skip_out_channels % _P == 0
        and model.cin_channels <= _P
        and model.kernel_size >= 2
        # weights + ~6 MB of activations/conditioning must fit VMEM
        and _vmem_bytes(model) <= 10 * 1024 * 1024
    )


def _pack_weights(model, params, dilations):
    """Stack per-layer weights into VMEM-resident bf16 tensors."""
    L = model.layers
    K = model.kernel_size
    G = model.gate_channels

    def st(fmt, leaf="kernel"):
        return jnp.stack([params[fmt.format(i)][leaf] for i in range(L)])

    dil_w = st("dilated_{}")  # (L, K, R, G)
    # ONE input matmul per layer: [h | tap_0 | ... | tap_{K-2}] (1, K*R)
    # against vstack(w_cur, w_tap_0, ..) (K*R, G). Row order matches the
    # kernel's concat order: current input first, then taps j=0..K-2.
    w_in = jnp.concatenate(
        [dil_w[:, K - 1]] + [dil_w[:, j] for j in range(K - 1)], axis=1
    ).astype(jnp.bfloat16)  # (L, K*R, G)
    b_dil = st("dilated_{}", "bias").astype(jnp.float32)       # (L, G)
    # ONE output matmul per layer: gated @ [w_skip | w_res] (G/2, S+R),
    # split back into skip and res lanes in the kernel
    w_sr = jnp.concatenate(
        [st("skip_{}")[:, 0], st("res_{}")[:, 0]], axis=-1
    ).astype(jnp.bfloat16)  # (L, G/2, S+R)
    b_res = st("res_{}", "bias").astype(jnp.float32)           # (L, R)
    b_skip = st("skip_{}", "bias").sum(0, keepdims=True).astype(jnp.float32)
    # cond: (L, C, G) -> (C, L*G) so one matmul serves every layer's gate
    w_cond = st("cond_{}")[:, 0]
    C = w_cond.shape[1]
    w_cdot = (
        jnp.transpose(w_cond, (1, 0, 2)).reshape(C, L * G).astype(jnp.bfloat16)
    )
    w_post1 = params["post1"]["kernel"][0].astype(jnp.bfloat16)
    b_post1 = params["post1"]["bias"][None].astype(jnp.float32)
    # pad the head to the full 128-lane row (zeros beyond out_channels)
    w_p2 = params["post2"]["kernel"][0]
    b_p2 = params["post2"]["bias"]
    S_ = w_p2.shape[0]
    w_post2 = jnp.zeros((S_, _P), jnp.bfloat16).at[:, : w_p2.shape[1]].set(
        w_p2.astype(jnp.bfloat16)
    )
    b_post2 = jnp.zeros((1, _P), jnp.float32).at[0, : b_p2.shape[0]].set(
        b_p2.astype(jnp.float32)
    )
    w_first = params["first_conv"]["kernel"][0].astype(jnp.float32)  # (1, R)
    b_first = params["first_conv"]["bias"][None].astype(jnp.float32)
    return (
        w_in, b_dil, w_sr, b_res, b_skip,
        w_post1, b_post1, w_post2, b_post2, w_first, b_first, w_cdot,
    )


def _uniform_from_bits(bits):
    """Random bits -> f32 uniforms in (eps, 1-eps).

    ``pltpu.prng_random_bits`` yields INT32, so a bare ``bits >> 8`` is an
    ARITHMETIC shift: the half of all draws with the sign bit set came
    out negative and clipped to the 1e-6 floor, collapsing half the
    gumbel/logistic noise to a constant. Mask to the low 24 bits after
    the shift so every draw is a uniform in [0, 1)."""
    u = ((bits >> 8) & 0xFFFFFF).astype(jnp.float32) * (1.0 / (1 << 24))
    return jnp.clip(u, 1e-6, 1.0 - 1e-6)


def _build_kernel(model, dilations, length, teacher: bool):
    L = model.layers
    K = model.kernel_size
    G = model.gate_channels
    G2 = G // 2
    n_mix = model.out_channels // 3
    rmax = (K - 1) * max(dilations)

    RD = rmax + 1  # ring depth: offsets 1..rmax must stay addressable

    S_out = model.skip_out_channels

    def kernel(*refs):
        if teacher:
            (w_in, b_dil, w_sr, b_res, b_skip,
             w_post1, b_post1, w_post2, b_post2, w_first, b_first,
             w_cdot, c_up, seed, x_in, out_ref, ring, cond_ref) = refs
        else:
            (w_in, b_dil, w_sr, b_res, b_skip,
             w_post1, b_post1, w_post2, b_post2, w_first, b_first,
             w_cdot, c_up, seed, out_ref, ring, cond_ref) = refs
        if not teacher:  # PRNG only needed for sampling (and the seed
            # primitive has no CPU-interpret lowering for parity tests)
            pltpu.prng_seed(seed[0])
        ring[:] = jnp.zeros_like(ring)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, _P), 1)

        def read_row(ref, t, group):
            """Row t of a 2-D ref without dynamic sublane indexing:
            read the tile-aligned group of rows around it (Mosaic can
            prove (t//g)*g is a multiple of g) and mask-reduce."""
            base = pl.multiple_of((t // group) * group, group)
            grp = ref[pl.ds(base, group), :].astype(jnp.float32)
            sub = jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0)
            return jnp.sum(
                jnp.where(sub == jax.lax.rem(t, group), grp, 0.0),
                axis=0, keepdims=True,
            )

        def write_row(ref, t, value_row):
            """Masked read-modify-write of row t (f32 ref, group 8)."""
            base = pl.multiple_of((t // 8) * 8, 8)
            grp = ref[pl.ds(base, 8), :]
            sub = jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0)
            ref[pl.ds(base, 8), :] = jnp.where(
                sub == jax.lax.rem(t, 8), value_row, grp
            )

        def step(t, h):
            # h: (1, R) bf16 — the embedded current input. In teacher
            # mode the input at step t is given (the caller pre-shifted
            # it, incremental_forward semantics), so embed it here and
            # ignore the carried feedback.
            if teacher:
                row = read_row(x_in, t // _P, 8)
                x_cur = jnp.sum(
                    jnp.where(lane == jax.lax.rem(t, _P), row, 0.0)
                )
                h = (x_cur * w_first[:] + b_first[:]).astype(jnp.bfloat16)
            # advance the ring ONCE per step: new[i] = old[i+1]; the
            # input from `off` steps ago then sits at STATIC slot
            # RD-1-off. (Measured against alternatives: group-masked
            # circular indexing was ~25% slower than this single rotate.)
            ring[:] = pltpu.roll(ring[:], RD - 1, 1)
            c_row = read_row(c_up, t, 16).astype(jnp.bfloat16)  # (1, C)
            # park the (1, L*G) conditioning row in VMEM scratch and
            # read 2-vreg slices per layer — holding it live as ~48
            # vector registers across the whole layer loop forces heavy
            # spilling (measured: the full kernel ran ~10x slower than
            # the bare chain micro-benchmark before this)
            cond_ref[0:1, :] = jnp.dot(
                c_row, w_cdot[:], preferred_element_type=jnp.float32
            )  # (1, L*G)
            skips = jnp.zeros((1, S_out), jnp.float32)
            for layer in range(L):
                # fused input matmul: [h | taps...] @ [w_cur; w_taps]
                taps = [
                    ring[
                        layer,
                        RD - 1 - dilations[layer] * (K - 1 - j)
                        : RD - dilations[layer] * (K - 1 - j),
                        :,
                    ].astype(jnp.bfloat16)
                    for j in range(K - 1)
                ]
                row = jnp.concatenate([h] + taps, axis=1)  # (1, K*R)
                z = jnp.dot(
                    row, w_in[layer], preferred_element_type=jnp.float32
                )
                z = z + b_dil[layer : layer + 1, :]
                z = z + cond_ref[0:1, layer * G : (layer + 1) * G]
                gated = jnp.tanh(z[:, :G2]) * jax.nn.sigmoid(z[:, G2:])
                gb = gated.astype(jnp.bfloat16)
                # fused output matmul: gated @ [w_skip | w_res]
                sr = jnp.dot(
                    gb, w_sr[layer], preferred_element_type=jnp.float32
                )
                skips = skips + sr[:, :S_out]
                # newest slot, static index (ring is f32: the Mosaic
                # rotate only supports 32-bit data)
                ring[layer, RD - 1 : RD, :] = h.astype(jnp.float32)
                h = (
                    h.astype(jnp.float32)
                    + sr[:, S_out:]
                    + b_res[layer : layer + 1, :]
                ).astype(jnp.bfloat16)
            out = jnp.maximum(skips + b_skip[:], 0.0)
            out = jnp.maximum(
                jnp.dot(
                    out.astype(jnp.bfloat16),
                    w_post1[:],
                    preferred_element_type=jnp.float32,
                )
                + b_post1[:],
                0.0,
            )
            logits = (
                jnp.dot(
                    out.astype(jnp.bfloat16),
                    w_post2[:],
                    preferred_element_type=jnp.float32,
                )
                + b_post2[:]
            )  # (1, 128); lanes >= out_channels are bias zeros

            if teacher:
                write_row(out_ref, t, logits)
                x = x_cur  # feedback unused in teacher mode
            else:
                # gumbel-max mixture choice, in-lane
                u1 = _uniform_from_bits(pltpu.prng_random_bits((1, _P)))
                gum = -jnp.log(-jnp.log(u1))
                score = jnp.where(lane < n_mix, logits + gum, -1e30)
                onehot = jnp.where(
                    (score >= jnp.max(score)) & (lane < n_mix), 1.0, 0.0
                )
                # mean/log_scale lanes sit n_mix / 2*n_mix to the right
                mean = jnp.sum(logits * pltpu.roll(onehot, n_mix, 1))
                log_scale = jnp.maximum(
                    jnp.sum(logits * pltpu.roll(onehot, 2 * n_mix, 1)),
                    LOG_SCALE_MIN,
                )
                u2 = _uniform_from_bits(pltpu.prng_random_bits((1, _P)))
                u = jnp.clip(jnp.sum(u2 * onehot), 1e-5, 1.0 - 1e-5)
                x = jnp.clip(
                    mean
                    + jnp.exp(log_scale) * (jnp.log(u) - jnp.log1p(-u)),
                    -1.0,
                    1.0,
                )
                # scatter the sample into row t//128, lane t%128
                val = jnp.where(lane == jax.lax.rem(t, _P), x, 0.0)
                keep = jnp.where(lane == jax.lax.rem(t, _P), 0.0, 1.0)
                base = pl.multiple_of((t // _P // 8) * 8, 8)
                grp = out_ref[pl.ds(base, 8), :]
                sub = jax.lax.broadcasted_iota(jnp.int32, grp.shape, 0)
                hit = sub == jax.lax.rem(t // _P, 8)
                out_ref[pl.ds(base, 8), :] = jnp.where(
                    hit, grp * keep + val, grp
                )
            h_next = (x * w_first[:] + b_first[:]).astype(jnp.bfloat16)
            return h_next

        h0 = (0.0 * w_first[:] + b_first[:]).astype(jnp.bfloat16)
        jax.lax.fori_loop(0, length, step, h0)

    return kernel


def _call(model, variables, c_up, seed, length, x_teacher=None,
          interpret: bool = False):
    # the model's own schedule (lazy import — models.wavenet imports this
    # module inside a function): any future schedule change reaches the
    # kernel's ring offsets and the scan sampler it is parity-tested
    # against identically
    from neural_sound_generation_tpu.models.wavenet import _dilations

    dilations = list(_dilations(model.layers, model.stacks))
    packed = _pack_weights(model, variables["params"], dilations)
    rmax = (model.kernel_size - 1) * max(dilations)
    teacher = x_teacher is not None
    kernel = _build_kernel(model, dilations, length, teacher)

    def pad_rows(a, mult):
        rows = -(-a.shape[0] // mult) * mult
        return jnp.zeros((rows,) + a.shape[1:], a.dtype).at[: a.shape[0]].set(a)

    n_rows = -(-length // _P)
    out_shape = (
        jax.ShapeDtypeStruct((-(-length // 8) * 8, _P), jnp.float32)
        if teacher
        else jax.ShapeDtypeStruct((-(-n_rows // 8) * 8, _P), jnp.float32)
    )
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    in_specs = [vmem] * 12 + [
        vmem,  # c_up
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
    ]
    args = packed + (pad_rows(c_up.astype(jnp.bfloat16), 16), seed)
    if teacher:
        in_specs.append(vmem)
        args = args + (pad_rows(x_teacher, 8),)
    return pl.pallas_call(
        kernel,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=vmem,
        scratch_shapes=[
            pltpu.VMEM(
                (model.layers, rmax + 1, model.residual_channels),
                jnp.float32,  # rotate is 32-bit-only on Mosaic
            ),
            pltpu.VMEM(
                (8, model.layers * model.gate_channels), jnp.float32
            ),  # per-step conditioning row (see kernel comment)
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)


def pallas_generate(model, variables, c_up, seed, length: int,
                    interpret: bool = False):
    """Generate ``length`` samples. c_up: (T>=length, C) upsampled mel
    conditioning at sample rate; seed: int or int32 array (traceable).
    Returns (length,) f32 samples."""
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(-1)[:1]
    out = _call(model, variables, c_up[:length], seed_arr, length,
                interpret=interpret)
    return out.reshape(-1)[:length]


def pallas_teacher_logits(model, variables, c_up, x, interpret: bool = False):
    """Teacher-forced logits through the kernel's math: x (T,) inputs ->
    (T, out_channels) logits. Parity target: WaveNet.incremental_forward
    / the parallel conv forward."""
    length = x.shape[0]
    n_rows = -(-length // _P)
    x_pad = (
        jnp.zeros((n_rows * _P,), jnp.float32).at[:length].set(x)
        .reshape(n_rows, _P)
    )
    seed_arr = jnp.asarray([0], jnp.int32)
    out = _call(model, variables, c_up[:length], seed_arr, length,
                x_teacher=x_pad, interpret=interpret)
    return out[:length, : model.out_channels]
