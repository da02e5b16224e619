"""Shared model layers.

Everything is NHWC (the TPU-native conv layout; XLA keeps channels on the
lane dimension) — the reference's NCHW permutes (models.py:128-141)
disappear entirely.
"""

from __future__ import annotations

import os
from typing import Any

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


def _use_phased() -> bool:
    """Phase-decomposed stride-2 convs (default on).

    ``NSG_CONV_IMPL=stock`` restores the plain XLA lowering. Read at trace
    time; every jitted program bakes in one choice.
    """
    return os.environ.get("NSG_CONV_IMPL", "phased") != "stock"


def _s2d_conv(inputs, kernel, strides, padding, *, lhs_dilation=None,
              rhs_dilation=None, dimension_numbers=None,
              feature_group_count=1, precision=None):
    """``lax.conv_general_dilated`` drop-in that rewrites the 4x4/s2/p1
    downsampling conv as space-to-depth + a dense 2x2/s1 conv.

    The rewrite is exact: y[m] = sum_t x_pad[2m+t] w[t] regroups by input
    phase (even/odd) into a 2-tap unit-stride conv over the phase-stacked
    channels. Same FLOPs forward — the win is the backward pass: the input
    gradient of a *strided* conv lowers as an LHS-dilated conv (multiplies
    inserted zeros on TPU), while the rewritten s1 conv's gradient is a
    dense conv. Used via flax's ``nn.Conv(conv_general_dilated=...)`` hook
    so parameter names/shapes stay byte-identical to stock ``Conv``.
    """
    supported = (
        inputs.ndim == 4
        and kernel.ndim == 4
        and kernel.shape[:2] == (4, 4)
        and tuple(strides) == (2, 2)
        and padding == ((1, 1), (1, 1))
        and tuple(lhs_dilation or (1, 1)) == (1, 1)
        and tuple(rhs_dilation or (1, 1)) == (1, 1)
        and feature_group_count == 1
        and _use_phased()
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
        supported = (
            x.ndim == 4
            and tuple(self.kernel_size) == (4, 4)
            and tuple(self.strides or (1, 1)) == (2, 2)
            and self.padding == "SAME"
            and not self.transpose_kernel
            and self.mask is None
            and tuple(self.kernel_dilation or (1, 1)) == (1, 1)
            and _use_phased()
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
