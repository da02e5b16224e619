"""Shared model layers.

Everything is NHWC (the TPU-native conv layout; XLA keeps channels on the
lane dimension) — the reference's NCHW permutes (models.py:128-141)
disappear entirely.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

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
    )


def conv_up(dim: int, name: str | None = None, dtype=jnp.float32) -> nn.ConvTranspose:
    """Stride-2 4x4 upsampling transpose conv (torch ConvTranspose2d(4,2,1)
    output size, 2H): flax 'SAME' pads the dilated input by 2 on each side,
    the same effective padding torch uses for k=4, s=2, p=1."""
    return nn.ConvTranspose(
        dim,
        (4, 4),
        strides=(2, 2),
        padding="SAME",
        kernel_init=conv_kernel_init,
        name=name,
        dtype=dtype,
    )
