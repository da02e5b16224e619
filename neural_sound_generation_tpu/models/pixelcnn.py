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
from typing import Any, Tuple

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
    spatial_cond: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x_v, x_h, label, cond_map=None):
        k = self.kernel
        dim2 = 2 * self.dim
        dt = self.dtype

        h_cond = nn.Embed(self.n_classes, dim2, name="class_cond_embedding")(label)
        h_cond = h_cond[:, None, None, :].astype(dt)
        if self.spatial_cond:
            # conditional PixelCNN: a per-position conditioning map joins
            # the class bias in both gates (used by the hierarchical
            # bottom prior, conditioned on the decoded top code grid)
            h_cond = h_cond + nn.Conv(
                dim2, (1, 1), kernel_init=conv_kernel_init, dtype=dt,
                name="spatial_cond"
            )(cond_map)

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
                x_v.astype(dt),
                v_kernel.astype(dt),
                (1, 1),
                ((k // 2, 0), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + v_bias.astype(dt)
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
                x_h.astype(dt),
                h_kernel.astype(dt),
                (1, 1),
                ((0, 0), (k // 2, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + h_bias.astype(dt)
        )

        v2h = nn.Conv(dim2, (1, 1), kernel_init=conv_kernel_init, dtype=dt,
                      name="vert_to_horiz")(h_vert)
        out = _gate(v2h + h_horiz + h_cond)
        out_h = nn.Conv(
            self.dim, (1, 1), kernel_init=conv_kernel_init, dtype=dt,
            name="horiz_resid"
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
    spatial_cond: bool = False
    # bf16 compute (params stay f32): +10% measured, PERF.md; the
    # prior CLI's --bf16 selects it
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, label: jnp.ndarray, cond_map=None
    ) -> jnp.ndarray:
        """x: int32 code grid (B, H, W); label: int32 (B,); cond_map
        (B, H, W, Cc) when ``spatial_cond`` (conditional PixelCNN).
        Returns logits (B, H, W, input_dim)."""
        h = nn.Embed(self.input_dim, self.dim, name="embedding")(x)  # (B,H,W,C)
        h = h.astype(self.dtype)
        x_v, x_h = h, h
        for i in range(self.n_layers):
            layer = GatedMaskedConvLayer(
                dim=self.dim,
                kernel=7 if i == 0 else 3,
                residual=i > 0,
                n_classes=self.n_classes,
                mask_a=i == 0,
                spatial_cond=self.spatial_cond,
                dtype=self.dtype,
                name=f"layer_{i}",
            )
            x_v, x_h = layer(x_v, x_h, label, cond_map)
        out = nn.Conv(512, (1, 1), kernel_init=conv_kernel_init,
                      dtype=self.dtype, name="out_hidden")(x_h)
        out = nn.relu(out)
        return nn.Conv(
            self.input_dim, (1, 1), kernel_init=conv_kernel_init,
            dtype=self.dtype, name="out_logits"
        )(out).astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _sample_fn(model: GatedPixelCNN, H: int, W: int, batch_size: int):
    """One jitted sampler per (model, grid, batch) — cached so repeated
    generation does not retrace."""

    def sample_fn(params, label, key, cond_map=None):
        x0 = jnp.zeros((batch_size, H, W), jnp.int32)

        def body(t, carry):
            x, key = carry
            i, j = t // W, t % W
            if model.spatial_cond:
                logits = model.apply(params, x, label, cond_map)
            else:
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

    return jax.jit(sample_fn, static_argnames=())


def generate(
    model: GatedPixelCNN,
    params,
    label: jnp.ndarray,
    key: jax.Array,
    shape: Tuple[int, int] = (8, 8),
    batch_size: int = 64,
    cond_map=None,
) -> jnp.ndarray:
    """Ancestral sampling of code grids, fully on device.

    Raster-order loop over H*W positions; each step runs the full forward
    (the reference's intended algorithm, models.py:327-341) under one jit
    with static shapes. ``cond_map`` feeds a spatial-conditional model
    (``spatial_cond=True``).
    """
    H, W = shape
    return _sample_fn(model, H, W, batch_size)(params, label, key, cond_map)


# ---------------------------------------------------------------------------
# Fast incremental sampler.
#
# The naive sampler above runs a full-image forward per pixel: O(H*W) full
# forwards.  The gated architecture allows much better: the vertical stack
# is a function of the embedding alone (out_v never sees x_h), and its
# output at row i depends only on rows < i — which are completely sampled
# before row i begins.  So the vertical half (all the big kxk convs) is
# computed ONCE per row over the full image, and the per-pixel inner loop
# reduces to the horizontal stack: per layer one (kw*C)x2C matmul, the
# gates, and two 1x1 projections.  Compute drops by ~2*W vs the naive
# sampler while following the same PRNG split order.
# ---------------------------------------------------------------------------


def _layer_specs(model: GatedPixelCNN):
    return [
        {"k": 7 if i == 0 else 3, "mask_a": i == 0, "residual": i > 0}
        for i in range(model.n_layers)
    ]


def _cond_broadcast(c):
    """Per-layer conditioning: (B, 2C) class bias or (B, H, W, 2C) map."""
    return c if c.ndim == 4 else c[:, None, None, :]


def _vertical_pass(p, specs, emb, cond):
    """All-layer vertical stack over the full image.

    Returns the per-layer vert-to-horiz maps stacked (L, B, H, W, 2C).
    Valid at row i whenever rows < i of ``emb`` are final (the mask-A
    first layer shifts the whole stack up one row, so row i never reads
    embedding row >= i).
    """
    x_v = emb
    v2h_all = []
    for l, spec in enumerate(specs):
        lp = p[f"layer_{l}"]
        k = spec["k"]
        kh = k // 2 + 1
        vk = lp["vert_kernel"]
        if spec["mask_a"]:
            # mask in the kernel's dtype: f32 ones would promote a bf16
            # kernel and break the conv's same-dtype requirement
            vk = vk * jnp.ones((kh, k, 1, 1), vk.dtype).at[kh - 1].set(0.0)
        h_vert = (
            jax.lax.conv_general_dilated(
                x_v, vk, (1, 1), ((k // 2, 0), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            + lp["vert_bias"]
        )
        v2h = (
            jnp.einsum("bhwc,cd->bhwd", h_vert, lp["vert_to_horiz"]["kernel"][0, 0])
            + lp["vert_to_horiz"]["bias"]
        )
        v2h_all.append(v2h)
        x_v = _gate(h_vert + _cond_broadcast(cond[l]))
    return jnp.stack(v2h_all)


def _row_scan(p, specs, v2h_row, cond, emb_table, init_emb_row, h_buf0, key,
              forced_row=None):
    """Sample (or teacher-force) one row given its vertical-stack slice.

    v2h_row: (L, B, W, 2C); init_emb_row: (B, W, C) embeddings of the row
    so far (zeros when sampling); h_buf0: (L-1, B, W, C) horizontal-stack
    inputs of layers 1..L-1 at columns < j.  Returns (pixels (B, W),
    logits (B, W, K), key).
    """
    L = len(specs)
    W = init_emb_row.shape[1]
    k0 = specs[0]["k"]
    pad0 = k0 // 2  # left zero-pad of the mask-A horizontal conv

    def cond_at(l, j):
        c = cond[l]
        return c if c.ndim == 2 else c[:, j]  # (B,2C) or row-sliced map

    def step(carry, j):
        emb_row, h_buf, key = carry
        lp0 = p["layer_0"]
        # mask-A horizontal conv: taps j-pad0 .. j-1 (col j masked out)
        padded = jnp.pad(emb_row, ((0, 0), (pad0, 0), (0, 0)))
        window = jax.lax.dynamic_slice_in_dim(padded, j, pad0, axis=1)
        h_horiz = (
            jnp.einsum("brc,rcd->bd", window, lp0["horiz_kernel"][0, :pad0])
            + lp0["horiz_bias"]
        )
        out = _gate(v2h_row[0][:, j] + h_horiz + cond_at(0, j))
        cur = (
            out @ lp0["horiz_resid"]["kernel"][0, 0]
            + lp0["horiz_resid"]["bias"]
        )
        new_bufs = []
        for l in range(1, L):
            lp = p[f"layer_{l}"]
            prev = jnp.where(j > 0, h_buf[l - 1, :, jnp.maximum(j - 1, 0)], 0.0)
            hk = lp["horiz_kernel"]  # (1, 2, C, 2C): taps j-1, j
            h_horiz = prev @ hk[0, 0] + cur @ hk[0, 1] + lp["horiz_bias"]
            out = _gate(v2h_row[l][:, j] + h_horiz + cond_at(l, j))
            out_h = (
                out @ lp["horiz_resid"]["kernel"][0, 0]
                + lp["horiz_resid"]["bias"]
                + cur
            )
            new_bufs.append(h_buf[l - 1].at[:, j].set(cur))
            cur = out_h
        if new_bufs:
            h_buf = jnp.stack(new_bufs)
        hidden = jax.nn.relu(
            cur @ p["out_hidden"]["kernel"][0, 0] + p["out_hidden"]["bias"]
        )
        logits = (
            hidden @ p["out_logits"]["kernel"][0, 0] + p["out_logits"]["bias"]
        ).astype(jnp.float32)
        key, sub = jax.random.split(key)
        if forced_row is None:
            pix = jax.random.categorical(sub, logits, axis=-1).astype(jnp.int32)
        else:
            pix = forced_row[:, j]
        emb_row = emb_row.at[:, j].set(emb_table[pix])
        return (emb_row, h_buf, key), (pix, logits)

    (_, _, key), (pix_cols, logit_cols) = jax.lax.scan(
        step, (init_emb_row, h_buf0, key), jnp.arange(W)
    )
    return (
        jnp.transpose(pix_cols, (1, 0)),
        jnp.transpose(logit_cols, (1, 0, 2)),
        key,
    )


def _run_incremental(
    model, params, label, key, H, W, batch_size, forced=None, cond_map=None
):
    p = params["params"]
    # compute dtype: one cast of the (f32) param tree at entry puts the
    # whole incremental path in the model's dtype; logits return to f32
    if model.dtype != jnp.float32:
        p = jax.tree_util.tree_map(
            lambda a: a.astype(model.dtype)
            if jnp.issubdtype(a.dtype, jnp.floating) else a,
            p,
        )
    specs = _layer_specs(model)
    L = len(specs)
    emb_table = p["embedding"]["embedding"]  # (K, C)
    C = emb_table.shape[1]
    cond = [
        p[f"layer_{l}"]["class_cond_embedding"]["embedding"][label]
        for l in range(L)
    ]
    if model.spatial_cond:
        if cond_map is None:
            raise ValueError("spatial_cond model requires cond_map")
        # cond_map arrives f32 from the caller; einsum-ing it against
        # the (possibly bf16-cast) kernel would promote the whole cond
        # path back to f32 and break the convs' same-dtype requirement
        cond_map = cond_map.astype(emb_table.dtype)
        cond = [
            c[:, None, None, :]
            + jnp.einsum(
                "bhwc,cd->bhwd", cond_map,
                p[f"layer_{l}"]["spatial_cond"]["kernel"][0, 0],
            )
            + p[f"layer_{l}"]["spatial_cond"]["bias"]
            for l, c in enumerate(cond)
        ]
    x0 = jnp.zeros((batch_size, H, W), jnp.int32) if forced is None else forced
    logits0 = jnp.zeros((batch_size, H, W, emb_table.shape[0]), jnp.float32)

    def row_body(i, carry):
        x, logits_all, key = carry
        v2h = _vertical_pass(p, specs, emb_table[x], cond)  # (L,B,H,W,2C)
        v2h_row = jax.lax.dynamic_slice_in_dim(v2h, i, 1, axis=2)[:, :, 0]
        cond_rows = [
            c if c.ndim == 2
            else jax.lax.dynamic_slice_in_dim(c, i, 1, axis=1)[:, 0]
            for c in cond
        ]
        h_buf0 = jnp.zeros((L - 1, batch_size, W, C), emb_table.dtype)
        emb_row0 = jnp.zeros((batch_size, W, C), emb_table.dtype)
        forced_row = (
            None if forced is None
            else jax.lax.dynamic_slice_in_dim(x, i, 1, axis=1)[:, 0]
        )
        pix, logits, key = _row_scan(
            p, specs, v2h_row, cond_rows, emb_table, emb_row0, h_buf0, key,
            forced_row=forced_row,
        )
        x = jax.lax.dynamic_update_slice(x, pix[:, None, :], (0, i, 0))
        logits_all = jax.lax.dynamic_update_slice(
            logits_all, logits[:, None], (0, i, 0, 0)
        )
        return x, logits_all, key

    x, logits_all, _ = jax.lax.fori_loop(0, H, row_body, (x0, logits0, key))
    return x, logits_all


@functools.lru_cache(maxsize=None)
def _fast_sample_fn(model: GatedPixelCNN, H: int, W: int, batch_size: int):
    def sample_fn(params, label, key, cond_map=None):
        x, _ = _run_incremental(
            model, params, label, key, H, W, batch_size, cond_map=cond_map
        )
        return x

    return jax.jit(sample_fn)


def fast_generate(
    model: GatedPixelCNN,
    params,
    label: jnp.ndarray,
    key: jax.Array,
    shape: Tuple[int, int] = (8, 8),
    batch_size: int = 64,
    cond_map=None,
) -> jnp.ndarray:
    """Incremental ancestral sampling: vertical stack once per row,
    horizontal stack per pixel — measured 25x faster than :func:`generate`
    on TPU v5e (batch 64, 32x32 grid: 141 ms vs 3.6 s) and ~22x faster to
    compile.  Same PRNG split order; samples are bit-identical wherever
    the arithmetic matches exactly (proven on CPU) and statistically
    identical otherwise (conv-vs-matmul float rounding can flip near-tie
    categorical draws)."""
    H, W = shape
    return _fast_sample_fn(model, H, W, batch_size)(
        params, label, key, cond_map
    )


def incremental_logits(model, params, x, label, cond_map=None):
    """Teacher-forced logits computed via the incremental path — must
    equal ``model.apply(params, x, label)``; exists to prove the fast
    sampler's arithmetic against the parallel forward."""
    B, H, W = x.shape
    _, logits = _run_incremental(
        model, params, label, jax.random.PRNGKey(0), H, W, B, forced=x,
        cond_map=cond_map,
    )
    return logits
