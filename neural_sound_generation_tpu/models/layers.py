"""Shared model layers.

Everything is NHWC (the TPU-native conv layout; XLA keeps channels on the
lane dimension) — the reference's NCHW permutes (models.py:128-141)
disappear entirely.
"""

from __future__ import annotations

import math
import os
from typing import Any

import numpy as np

import flax.linen as nn
import jax.numpy as jnp
from jax import lax

# Xavier-uniform conv kernels + zero bias, matching the reference's
# weights_init (models.py:25-32).
conv_kernel_init = nn.initializers.xavier_uniform()


def make_norm(norm: str, train: bool, dtype=jnp.float32, name=None):
    """Normalization layer by name.

    * "batch" — BatchNorm (reference parity, models.py BatchNorm2d).
      Under pjit the batch statistics are computed over the *global*
      batch automatically (GSPMD reduces across the data axis).
    * "group" — GroupNorm(32 groups): statistics are per-sample, so
      replicas never need synchronized running stats (SURVEY §7 hard
      part 4's alternative).
    """
    if norm == "batch":
        return nn.BatchNorm(use_running_average=not train, dtype=dtype, name=name)
    if norm == "group":
        return nn.GroupNorm(num_groups=None, group_size=8, dtype=dtype, name=name)
    raise ValueError(f"unknown norm: {norm!r}")


class ResBlock(nn.Module):
    """Pre-activation residual block (models.py:145-158):
    ReLU -> 3x3 conv -> BN -> ReLU -> 1x1 conv -> BN, plus skip.

    ``dtype`` is the compute dtype (bfloat16 feeds the MXU at full rate);
    params stay float32, BatchNorm statistics are computed in float32."""

    dim: int
    dtype: Any = jnp.float32
    norm: str = "batch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = True) -> jnp.ndarray:
        h = nn.relu(x)
        h = nn.Conv(
            self.dim, (3, 3), padding=((1, 1), (1, 1)),
            kernel_init=conv_kernel_init, dtype=self.dtype,
        )(h)
        h = make_norm(self.norm, train, self.dtype)(h)
        h = nn.relu(h)
        h = nn.Conv(self.dim, (1, 1), kernel_init=conv_kernel_init,
                    dtype=self.dtype)(h)
        h = make_norm(self.norm, train, self.dtype)(h)
        return x + h


def _use_phased(edge_channels: int | None = None) -> bool:
    """Phase-decomposed stride-2 convs (``NSG_CONV_IMPL``).

    Modes (read at trace time; every jitted program bakes in one choice):

    * ``stock`` — plain XLA lowering everywhere. The same-window TPU
      A/B (tools/ab_conv_impl.py, compile-cached, 3 blocked rounds per
      leg) measured stock FASTER than ``phased`` on the real chip —
      vqvae 393.3 vs 345.2 steps/s, wavevqvae 302.8 vs 259.9, vocoder a
      wash (69.3 vs 69.0). XLA's own lowering of the LHS-dilated conv
      evidently already avoids the zero-multiply tax the decomposition
      targets, and the phased reshape/transpose chains add layout work
      on the hot 256-channel convs.
    * ``phased`` — decompose every supported stride conv (exact
      numerics, identical checkpoints — see the parity tests in
      tests/test_models.py); kept for future XLA versions or shapes
      where the trade flips.
    * ``edge`` (default) — decompose ONLY 2-D convs whose MXU-critical
      channel dim (``edge_channels``: input channels for a downsampling
      conv, output features for a transpose conv) is <= 8: the
      1-channel spectrogram stem and audio head, where lane padding
      wastes most of the systolic array, while the hot wide convs keep
      the stock lowering. Measured (same-window TPU A/B, stock
      sandwich): vqvae 401.4 vs 394.6/394.3 steps/s (+1.7%). The 1-D
      family is NOT edge-decomposed: the same A/B measured the 1-D
      decomposition LOSING 11% on wavevqvae (268.9 vs 301.6/299.8) —
      the per-phase slice/stack layout work on long sequences outweighs
      the lane-padding win — so the 1-D call sites never request edge.
    """
    mode = os.environ.get("NSG_CONV_IMPL", "edge")
    if mode == "phased":
        return True
    if mode == "edge":
        return edge_channels is not None and edge_channels <= 8
    if mode != "stock":
        # a typo ('egde', 'Edge', '') silently measuring stock would
        # corrupt the A/B methodology the default decision rests on
        raise ValueError(
            f"NSG_CONV_IMPL={mode!r}: expected stock|phased|edge"
        )
    return False


def _s2d_conv(inputs, kernel, strides, padding, *, lhs_dilation=None,
              rhs_dilation=None, dimension_numbers=None,
              feature_group_count=1, precision=None):
    """``lax.conv_general_dilated`` drop-in that rewrites the 4x4/s2/p1
    downsampling conv as space-to-depth + a dense 2x2/s1 conv (and the 1-D
    4/s2/p1 analog as sample-pair-to-depth + a dense 2-tap/s1 conv).

    The rewrite is exact: y[m] = sum_t x_pad[2m+t] w[t] regroups by input
    phase (even/odd) into a 2-tap unit-stride conv over the phase-stacked
    channels. Same FLOPs forward — the win is the backward pass: the input
    gradient of a *strided* conv lowers as an LHS-dilated conv (multiplies
    inserted zeros on TPU), while the rewritten s1 conv's gradient is a
    dense conv. Used via flax's ``nn.Conv(conv_general_dilated=...)`` hook
    so parameter names/shapes stay byte-identical to stock ``Conv``.
    """
    ones = tuple(1 for _ in strides)
    supported_1d = (
        inputs.ndim == 3
        and kernel.ndim == 3
        and kernel.shape[0] == 4
        and tuple(strides) == (2,)
        and padding == ((1, 1),)
        and tuple(lhs_dilation or ones) == ones
        and tuple(rhs_dilation or ones) == ones
        and feature_group_count == 1
        and _use_phased()  # 1-D: edge measured -11% (wavevqvae); phased only
    )
    if supported_1d:
        b, t, ci = inputs.shape
        co = kernel.shape[-1]
        tp = t + 2 + (t % 2)
        xp = jnp.pad(inputs, ((0, 0), (1, tp - t - 1), (0, 0)))
        xs = xp.reshape(b, tp // 2, 2 * ci)
        k = kernel.reshape(2, 2 * ci, co)
        y = lax.conv_general_dilated(
            xs, k, (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"), precision=precision)
        return y[:, : t // 2, :]
    supported = (
        inputs.ndim == 4
        and kernel.ndim == 4
        and kernel.shape[:2] == (4, 4)
        and tuple(strides) == (2, 2)
        and padding == ((1, 1), (1, 1))
        and tuple(lhs_dilation or (1, 1)) == (1, 1)
        and tuple(rhs_dilation or (1, 1)) == (1, 1)
        and feature_group_count == 1
        and _use_phased(inputs.shape[-1])
    )
    if not supported:
        return lax.conv_general_dilated(
            inputs, kernel, strides, padding, lhs_dilation=lhs_dilation,
            rhs_dilation=rhs_dilation, dimension_numbers=dimension_numbers,
            feature_group_count=feature_group_count, precision=precision)
    b, h, w, ci = inputs.shape
    co = kernel.shape[-1]
    # pad by 1 (the p=1 halo) plus a zero row/col on the right when needed
    # to make the padded extent even for the phase split; the extra
    # positions are sliced off below (output count is h//2 x w//2 either
    # way, matching the stock strided conv).
    hp, wp = h + 2 + (h % 2), w + 2 + (w % 2)
    xp = jnp.pad(inputs, ((0, 0), (1, hp - h - 1), (1, wp - w - 1), (0, 0)))
    xs = (
        xp.reshape(b, hp // 2, 2, wp // 2, 2, ci)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, hp // 2, wp // 2, 4 * ci)
    )
    # W[2a+py, 2b+px, ci, co] -> K[a, b, (py*2+px)*ci + ci_idx, co]
    k = (
        kernel.reshape(2, 2, 2, 2, ci, co)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(2, 2, 4 * ci, co)
    )
    y = lax.conv_general_dilated(
        xs, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
    return y[:, : h // 2, : w // 2, :]


class ConvTranspose(nn.ConvTranspose):
    """``nn.ConvTranspose`` with the 4x4/s2/SAME case lowered as a dense
    2x2 conv to 4x output phases + depth-to-space interleave.

    ``lax.conv_transpose`` lowers as an LHS-dilated conv — on TPU the MXU
    multiplies the inserted zeros, executing ~4x the effective FLOPs. The
    phase decomposition (y[2m] = x[m-1]w0 + x[m]w2; y[2m+1] = x[m]w1 +
    x[m+1]w3, per spatial axis) computes only the effective work, and its
    backward is likewise dilation-free. Exact same math per output (same
    4-tap sums), same parameter tree (class name kept so flax auto-naming
    and checkpoints are unchanged). Falls back to the stock path for any
    other configuration or under ``NSG_CONV_IMPL=stock``.
    """

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # type: ignore[override]
        supported_1d = (
            x.ndim == 3
            and len(tuple(self.kernel_size)) == 1
            and self.strides is not None
            and len(tuple(self.strides)) == 1
            and tuple(self.strides)[0] > 1
            and self.padding == "SAME"
            and not self.transpose_kernel
            and self.mask is None
            and tuple(self.kernel_dilation or (1,)) == (1,)
            and _use_phased()  # 1-D: edge measured -11%; phased only
        )
        if supported_1d:
            return self._phased_1d(x)
        supported = (
            x.ndim == 4
            and tuple(self.kernel_size) == (4, 4)
            and tuple(self.strides or (1, 1)) == (2, 2)
            and self.padding == "SAME"
            and not self.transpose_kernel
            and self.mask is None
            and tuple(self.kernel_dilation or (1, 1)) == (1, 1)
            and _use_phased(self.features)
        )
        if not supported:
            return super().__call__(x)
        b, h, w, ci = x.shape
        co = self.features
        kernel = self.param(
            "kernel", self.kernel_init, (4, 4, ci, co), self.param_dtype)
        bias = (
            self.param("bias", self.bias_init, (co,), self.param_dtype)
            if self.use_bias else None)
        x, kernel, bias = self.promote_dtype(x, kernel, bias, dtype=self.dtype)
        # W[2a+py, 2b+px, ci, co] -> K[a, b, ci, (py*2+px)*co + co_idx]
        k = (
            kernel.reshape(2, 2, 2, 2, ci, co)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(2, 2, ci, 4 * co)
        )
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        z = lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=self.precision)
        z = z.reshape(b, h + 1, w + 1, 2, 2, co)
        p00 = z[:, :h, :w, 0, 0]
        p01 = z[:, :h, 1:, 0, 1]
        p10 = z[:, 1:, :w, 1, 0]
        p11 = z[:, 1:, 1:, 1, 1]
        y = jnp.stack(
            [jnp.stack([p00, p01], axis=3), jnp.stack([p10, p11], axis=3)],
            axis=2,
        ).reshape(b, 2 * h, 2 * w, co)
        if bias is not None:
            y = y + bias.reshape((1, 1, 1, co))
        return y

    def _phased_1d(self, x: jnp.ndarray) -> jnp.ndarray:
        """General (k, s) 1-D SAME transpose conv as ONE dense unit-stride
        conv over per-phase regrouped kernels + an interleave.

        Output n = s*m + p takes taps t = s*d + pad_a - p (0 <= t < k) from
        x[m + d], where pad_a is the left pad ``lax.conv_transpose`` derives
        for SAME. Per phase that is a ceil(k/s)-tap unit-stride conv; all s
        phases stack into the output-channel dim of one conv producing
        (B, T, s*co) at a common window width w = max per-phase tap count
        (each phase then reads its own shifted slice). The stock lowering
        dilates x with s-1 zeros between samples and runs the full k-tap
        conv at every output — ~s x the useful MACs; this path does
        w*s ~= k MACs per input sample, i.e. exactly the useful work (plus
        at most one masked tap row when s does not divide k). Same math per
        output sample; same parameter tree as stock ``nn.ConvTranspose``.
        """
        k = tuple(self.kernel_size)[0]
        s = tuple(self.strides)[0]
        b, t, ci = x.shape
        co = self.features
        kernel = self.param(
            "kernel", self.kernel_init, (k, ci, co), self.param_dtype)
        bias = (
            self.param("bias", self.bias_init, (co,), self.param_dtype)
            if self.use_bias else None)
        x, kernel, bias = self.promote_dtype(x, kernel, bias, dtype=self.dtype)
        pad_len = k + s - 2
        pad_a = k - 1 if s > k - 1 else -(-pad_len // 2)
        d0 = [math.ceil((p - pad_a) / s) for p in range(s)]
        w = max((k - 1 + p - pad_a) // s - d0[p] + 1 for p in range(s))
        dmin = min(d0)
        dmax = max(dp + w - 1 for dp in d0)
        # taps[j, p] = kernel row feeding phase p at window offset j
        taps = np.array(
            [[s * (d0[p] + j) + pad_a - p for p in range(s)] for j in range(w)])
        valid = (taps >= 0) & (taps < k)
        kk = kernel[np.clip(taps, 0, k - 1)]  # (w, s, ci, co), static gather
        kk = kk * jnp.asarray(valid, kk.dtype)[..., None, None]
        kk = kk.transpose(0, 2, 1, 3).reshape(w, ci, s * co)
        xp = jnp.pad(x, ((0, 0), (-dmin, dmax), (0, 0)))
        z = lax.conv_general_dilated(
            xp, kk, (1,), "VALID",
            dimension_numbers=("NWC", "WIO", "NWC"),
            precision=self.precision)
        phases = [
            z[:, d0[p] - dmin: d0[p] - dmin + t, p * co:(p + 1) * co]
            for p in range(s)
        ]
        y = jnp.stack(phases, axis=2).reshape(b, s * t, co)
        if bias is not None:
            y = y + bias.reshape((1, 1, co))
        return y


def conv_down(dim: int, name: str | None = None, dtype=jnp.float32) -> nn.Conv:
    """Stride-2 4x4 downsampling conv (torch Conv2d(k=4, s=2, p=1))."""
    return nn.Conv(
        dim,
        (4, 4),
        strides=(2, 2),
        padding=((1, 1), (1, 1)),
        kernel_init=conv_kernel_init,
        name=name,
        dtype=dtype,
        conv_general_dilated=_s2d_conv,
    )


def conv_up(dim: int, name: str | None = None, dtype=jnp.float32) -> nn.ConvTranspose:
    """Stride-2 4x4 upsampling transpose conv (torch ConvTranspose2d(4,2,1)
    output size, 2H): flax 'SAME' pads the dilated input by 2 on each side,
    the same effective padding torch uses for k=4, s=2, p=1."""
    return ConvTranspose(
        dim,
        (4, 4),
        strides=(2, 2),
        padding="SAME",
        kernel_init=conv_kernel_init,
        name=name,
        dtype=dtype,
    )
