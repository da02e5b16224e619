"""Gated PixelCNN prior over discrete VQ code grids.

Capability parity with the reference ``GatedPixelCNN`` (models.py:285-341):
15 gated masked-conv layers (mask A first, 7x7; mask B after, 3x3) with
class-conditional biases, trained to autoregressively model code indices;
ancestral sampling generates new code grids for the VQ-VAE decoder.

TPU-first differences from the reference:
  * Causality is enforced by *constant kernel masks* applied functionally
    each call — the reference mutates the A-layer weights in-place on every
    forward (models.py:259-265), which breaks under functional transforms
    and silently corrupts the optimizer's view of the weights.
  * Asymmetric causal padding replaces pad-then-crop, and cropping uses the
    height axis correctly (the reference crops with ``x_v.size(-1)`` — the
    *width* — models.py:269, a latent bug for non-square grids).
  * ``generate`` is a ``lax.fori_loop`` with on-device categorical sampling
    (the reference version crashes: ``torch.zeros((batch_size, shape))``
    with a tuple, models.py:329-332).
"""

from __future__ import annotations

import functools
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.layers import conv_kernel_init


class GatedMaskedConvLayer(nn.Module):
    """One gated layer (models.py:228-282): vertical + horizontal stacks,
    class-conditional bias, gated tanh/sigmoid activation, optional
    horizontal residual."""

    dim: int
    kernel: int
    residual: bool = True
    n_classes: int = 10
    mask_a: bool = False

    @nn.compact
    def __call__(self, x_v, x_h, label):
        k = self.kernel
        dim2 = 2 * self.dim

        h_cond = nn.Embed(self.n_classes, dim2, name="class_cond_embedding")(label)
        h_cond = h_cond[:, None, None, :]

        # --- vertical stack ---
        kh = k // 2 + 1
        v_kernel = self.param(
            "vert_kernel", conv_kernel_init, (kh, k, x_v.shape[-1], dim2)
        )
        v_bias = self.param("vert_bias", nn.initializers.zeros, (dim2,))
        if self.mask_a:
            v_kernel = v_kernel * jnp.ones((kh, k, 1, 1)).at[kh - 1].set(0.0)
        h_vert = (
            jax.lax.conv_general_dilated(
                x_v,
                v_kernel,
                (1, 1),
                ((k // 2, 0), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + v_bias
        )
        out_v = _gate(h_vert + h_cond)

        # --- horizontal stack ---
        kw = k // 2 + 1
        h_kernel = self.param(
            "horiz_kernel", conv_kernel_init, (1, kw, x_h.shape[-1], dim2)
        )
        h_bias = self.param("horiz_bias", nn.initializers.zeros, (dim2,))
        if self.mask_a:
            h_kernel = h_kernel * jnp.ones((1, kw, 1, 1)).at[:, kw - 1].set(0.0)
        h_horiz = (
            jax.lax.conv_general_dilated(
                x_h,
                h_kernel,
                (1, 1),
                ((0, 0), (k // 2, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + h_bias
        )

        v2h = nn.Conv(dim2, (1, 1), kernel_init=conv_kernel_init, name="vert_to_horiz")(
            h_vert
        )
        out = _gate(v2h + h_horiz + h_cond)
        out_h = nn.Conv(
            self.dim, (1, 1), kernel_init=conv_kernel_init, name="horiz_resid"
        )(out)
        if self.residual:
            out_h = out_h + x_h
        return out_v, out_h


def _gate(x: jnp.ndarray) -> jnp.ndarray:
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.tanh(a) * jax.nn.sigmoid(b)


class GatedPixelCNN(nn.Module):
    """input_dim = number of discrete values (codebook size), dim = hidden
    width, n_layers gated blocks, class-conditioned (models.py:285-325)."""

    input_dim: int = 256
    dim: int = 64
    n_layers: int = 15
    n_classes: int = 10

    @nn.compact
    def __call__(self, x: jnp.ndarray, label: jnp.ndarray) -> jnp.ndarray:
        """x: int32 code grid (B, H, W); label: int32 (B,).
        Returns logits (B, H, W, input_dim)."""
        h = nn.Embed(self.input_dim, self.dim, name="embedding")(x)  # (B,H,W,C)
        x_v, x_h = h, h
        for i in range(self.n_layers):
            layer = GatedMaskedConvLayer(
                dim=self.dim,
                kernel=7 if i == 0 else 3,
                residual=i > 0,
                n_classes=self.n_classes,
                mask_a=i == 0,
                name=f"layer_{i}",
            )
            x_v, x_h = layer(x_v, x_h, label)
        out = nn.Conv(512, (1, 1), kernel_init=conv_kernel_init, name="out_hidden")(
            x_h
        )
        out = nn.relu(out)
        return nn.Conv(
            self.input_dim, (1, 1), kernel_init=conv_kernel_init, name="out_logits"
        )(out)


@functools.lru_cache(maxsize=None)
def _sample_fn(model: GatedPixelCNN, H: int, W: int, batch_size: int):
    """One jitted sampler per (model, grid, batch) — cached so repeated
    generation does not retrace."""

    def sample_fn(params, label, key):
        x0 = jnp.zeros((batch_size, H, W), jnp.int32)

        def body(t, carry):
            x, key = carry
            i, j = t // W, t % W
            logits = model.apply(params, x, label)  # (B,H,W,K)
            key, sub = jax.random.split(key)
            pix = jax.random.categorical(
                sub, logits[:, i, j, :], axis=-1
            )  # (B,)
            x = jax.lax.dynamic_update_slice(
                x, pix.astype(jnp.int32)[:, None, None], (0, i, j)
            )
            return x, key

        x, _ = jax.lax.fori_loop(0, H * W, body, (x0, key))
        return x

    return jax.jit(sample_fn)


def generate(
    model: GatedPixelCNN,
    params,
    label: jnp.ndarray,
    key: jax.Array,
    shape: Tuple[int, int] = (8, 8),
    batch_size: int = 64,
) -> jnp.ndarray:
    """Ancestral sampling of code grids, fully on device.

    Raster-order loop over H*W positions; each step runs the full forward
    (the reference's intended algorithm, models.py:327-341) under one jit
    with static shapes.
    """
    H, W = shape
    return _sample_fn(model, H, W, batch_size)(params, label, key)
