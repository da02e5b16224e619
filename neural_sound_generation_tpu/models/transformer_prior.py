"""Autoregressive Transformer prior over VQ code grids.

The reference's generative core is the GatedPixelCNN prior over discrete
codes (reference src/models.py:285-341). This module is the TPU-first
upgrade of that component — same task (class-conditioned autoregressive
density over (H, W) code grids, raster order), same CLI/artifact surface
(``cli/prior.py --arch transformer``), but built from causal
self-attention instead of masked convolutions:

* Teacher-forced training is a handful of large batched matmuls per
  layer — exactly the shape the MXU wants — instead of many small masked
  convs (PixelCNN's 7x7/3x3 stacks).
* Ancestral sampling uses a KV cache: each of the H*W steps costs one
  (B, D) pass through the blocks plus O(T·dim) attention reads, instead
  of PixelCNN's per-row stack re-runs.
* Conditioning matches the PixelCNN surface: a class label added to
  every position, and (for the hierarchical bottom prior) a spatial
  ``cond_map`` projected per position (``spatial_cond=True``).

Factorization: position t in raster order predicts ``codes[t]`` given
``codes[:t]`` — the input at t is the embedding of ``codes[t-1]`` (a
learned BOS vector at t=0) plus factored row/col positional embeddings,
the class embedding, and the conditioning projection *at position t*
(external conditioning is fully visible; only the code sequence is
causally masked).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from neural_sound_generation_tpu.ops.pallas.attention import (
    causal_attention,
)

__all__ = ["TransformerPrior", "generate", "incremental_logits"]


class _Block(nn.Module):
    """Pre-LN transformer block. Attention and MLP are split into named
    Dense submodules so the tensor-parallel rules (parallel/mesh.py) can
    shard attn_qkv/mlp_in on output channels and attn_out/mlp_out on
    input channels (Megatron layout: one all-reduce per residual join,
    inserted by GSPMD)."""

    dim: int
    n_heads: int
    mlp_ratio: int = 4
    # n_experts > 0 swaps the dense MLP for a switch-routed MoE
    # (models/moe.py) — expert weights shard over 'model' (EP)
    n_experts: int = 0
    capacity_factor: float = 1.25
    dtype: Any = jnp.float32

    def setup(self):
        d = self.dim
        self.ln1 = nn.LayerNorm(dtype=jnp.float32, name="ln1")
        self.ln2 = nn.LayerNorm(dtype=jnp.float32, name="ln2")
        self.attn_qkv = nn.Dense(3 * d, dtype=self.dtype, name="attn_qkv")
        self.attn_out = nn.Dense(d, dtype=self.dtype, name="attn_out")
        if self.n_experts > 0:
            from neural_sound_generation_tpu.models.moe import SwitchMoE

            self.moe = SwitchMoE(
                dim=d, n_experts=self.n_experts,
                mlp_ratio=self.mlp_ratio,
                capacity_factor=self.capacity_factor,
                dtype=self.dtype, name="moe",
            )
        else:
            self.mlp_in = nn.Dense(self.mlp_ratio * d, dtype=self.dtype,
                                   name="mlp_in")
            self.mlp_out = nn.Dense(d, dtype=self.dtype, name="mlp_out")

    def _mlp(self, h: jnp.ndarray) -> jnp.ndarray:
        """Post-ln2 feed-forward: dense pair or routed experts."""
        if self.n_experts > 0:
            return self.moe(h)
        return self.mlp_out(nn.gelu(self.mlp_in(h)))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, D); causal self-attention over T."""
        b, t, d = x.shape
        hd = d // self.n_heads
        h = self.ln1(x).astype(self.dtype)
        qkv = self.attn_qkv(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # (B, Hh, T, hd) — the layout ops/pallas/attention.py expects;
        # logits are computed in f32 inside both backends (bf16 loses
        # too much around the max)
        q = q.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, self.n_heads, hd).transpose(0, 2, 1, 3)
        o = causal_attention(q, k, v, scale=1.0 / np.sqrt(hd))
        o = o.transpose(0, 2, 1, 3).reshape(b, t, d)
        x = x + self.attn_out(o).astype(x.dtype)
        h = self.ln2(x).astype(self.dtype)
        x = x + self._mlp(h).astype(x.dtype)
        return x

    def decode_step(self, x, k_cache, v_cache, t, moe_counts=None,
                    moe_cap: int = 0):
        """One position with a KV cache.

        x: (B, D) input at position t; k_cache/v_cache: (B, T, Hh, hd)
        with positions < t filled; t: () int32. Routed blocks
        (n_experts > 0) additionally carry ``moe_counts`` (B, E) int32 —
        per-expert dispatch counts so sampling reproduces the
        teacher-forced capacity drops — and need the static ``moe_cap``
        for the full sequence length. Returns
        (y (B, D), k_cache, v_cache, moe_counts) with position t
        written."""
        b, d = x.shape
        hd = d // self.n_heads
        h = self.ln1(x).astype(self.dtype)
        qkv = self.attn_qkv(h)                        # (B, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, self.n_heads, hd)
        k_cache = lax.dynamic_update_slice(
            k_cache, k.reshape(b, 1, self.n_heads, hd), (0, t, 0, 0))
        v_cache = lax.dynamic_update_slice(
            v_cache, v.reshape(b, 1, self.n_heads, hd), (0, t, 0, 0))
        att = jnp.einsum(
            "bhd,bkhd->bhk", q, k_cache,
            preferred_element_type=jnp.float32,
        ) * (1.0 / np.sqrt(hd))                       # (B, Hh, T)
        pos = jnp.arange(k_cache.shape[1])
        att = jnp.where(pos[None, None, :] <= t, att, -jnp.inf)
        att = jax.nn.softmax(att, axis=-1).astype(self.dtype)
        o = jnp.einsum(
            "bhk,bkhd->bhd", att, v_cache,
            preferred_element_type=jnp.float32,
        ).reshape(b, d)
        x = x + self.attn_out(o).astype(x.dtype)
        h = self.ln2(x).astype(self.dtype)
        if self.n_experts > 0:
            y, moe_counts = self.moe.step(h, moe_counts, moe_cap)
            x = x + y.astype(x.dtype)
        else:
            x = x + self._mlp(h).astype(x.dtype)
        return x, k_cache, v_cache, moe_counts


class TransformerPrior(nn.Module):
    """Decoder-only Transformer over (H, W) code grids.

    Drop-in peer of :class:`GatedPixelCNN`: same call signature
    ``(codes (B, H, W) int, label (B,) int[, cond_map (B, H, W, Cc)])``
    returning per-position logits ``(B, H, W, input_dim)``, so the
    trainer's prior loss, the prior CLI, and the hierarchical chain reuse
    it unchanged."""

    input_dim: int = 512        # codebook size K
    dim: int = 256
    n_layers: int = 6
    # 64-wide heads: narrower heads under-fill the 128-wide MXU on the
    # QK^T/PV contractions (measured head-width sweep, PERF.md)
    n_heads: int = 4
    n_classes: int = 10
    mlp_ratio: int = 4
    # n_experts > 0: switch-MoE feed-forwards (models/moe.py); expert
    # weights shard over 'model' — the framework's expert parallelism
    n_experts: int = 0
    capacity_factor: float = 1.25
    spatial_cond: bool = False
    dtype: Any = jnp.float32
    # positional tables cover any grid up to (max_rows, max_cols); they
    # are tiny ((64, dim) each) so the default is generous
    max_rows: int = 64
    max_cols: int = 64

    def setup(self):
        self.tok_embed = nn.Embed(self.input_dim, self.dim, name="tok_embed")
        self.class_embed = nn.Embed(self.n_classes, self.dim,
                                    name="class_embed")
        self.bos = self.param("bos", nn.initializers.normal(0.02),
                              (self.dim,))
        self.row_embed = nn.Embed(self.max_rows, self.dim, name="row_embed")
        self.col_embed = nn.Embed(self.max_cols, self.dim, name="col_embed")
        if self.spatial_cond:
            self.cond_proj = nn.Dense(self.dim, name="cond_proj")
        self.blocks = [
            _Block(dim=self.dim, n_heads=self.n_heads,
                   mlp_ratio=self.mlp_ratio, n_experts=self.n_experts,
                   capacity_factor=self.capacity_factor, dtype=self.dtype,
                   name=f"block_{i}")
            for i in range(self.n_layers)
        ]
        self.ln_f = nn.LayerNorm(dtype=jnp.float32, name="ln_f")
        self.head = nn.Dense(self.input_dim, dtype=self.dtype, name="head")

    def _pos_table(self, h: int, w: int) -> jnp.ndarray:
        if h > self.max_rows or w > self.max_cols:
            raise ValueError(
                f"code grid {(h, w)} exceeds positional tables "
                f"({self.max_rows}, {self.max_cols}); raise max_rows/max_cols"
            )
        rows = self.row_embed(jnp.arange(h))                 # (H, D)
        cols = self.col_embed(jnp.arange(w))                 # (W, D)
        return (rows[:, None, :] + cols[None, :, :]).reshape(h * w, self.dim)

    def embed_sequence(
        self,
        codes: jnp.ndarray,
        label: jnp.ndarray,
        cond_map: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Block-stack input: shifted token embeddings + positional +
        class (+ spatial conditioning). (B, H, W) int -> (B, T, D).
        Split out from ``__call__`` so the pipeline-parallel path
        (parallel/pipeline.py) can run the embedding outside the staged
        block loop."""
        b, h, w = codes.shape
        t = h * w
        tok = self.tok_embed(codes.reshape(b, t))            # (B, T, D)
        bos = jnp.broadcast_to(self.bos, (b, 1, self.dim)).astype(tok.dtype)
        x = jnp.concatenate([bos, tok[:, :-1]], axis=1)
        x = x + self._pos_table(h, w)[None]
        x = x + self.class_embed(label)[:, None, :]
        if self.spatial_cond:
            if cond_map is None:
                raise ValueError("spatial_cond model needs cond_map")
            x = x + self.cond_proj(
                cond_map.reshape(b, t, cond_map.shape[-1]))
        return x

    def head_logits(self, x: jnp.ndarray) -> jnp.ndarray:
        """Final LayerNorm + vocab head: (B, T, D) -> (B, T, K) f32."""
        return self.head(self.ln_f(x).astype(self.dtype)).astype(jnp.float32)

    def __call__(
        self,
        codes: jnp.ndarray,
        label: jnp.ndarray,
        cond_map: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, h, w = codes.shape
        x = self.embed_sequence(codes, label, cond_map)
        for blk in self.blocks:
            x = blk(x)
        logits = self.head_logits(x)
        return logits.reshape(b, h, w, self.input_dim)

    def embed_step(self, prev_tok, label, t, h: int, w: int, cond_row=None):
        """Input activation for position t during sampling: embedding of
        the previous token (the BOS vector at t=0) + pos[t] + class
        [+ cond at t]. prev_tok: (B,) int32; t: () int32;
        cond_row: (B, Cc) or None. Returns (B, D)."""
        tok = self.tok_embed(prev_tok)                       # (B, D)
        x = jnp.where(t == 0, self.bos[None, :].astype(tok.dtype), tok)
        r, c = t // w, t % w
        x = x + self.row_embed(r) + self.col_embed(c)
        x = x + self.class_embed(label)
        if self.spatial_cond:
            if cond_row is None:
                raise ValueError("spatial_cond model needs cond_row")
            x = x + self.cond_proj(cond_row)
        return x

    def decode_step(self, x, caches, t, moe_cap: int = 0):
        """One cached position through all blocks.

        x: (B, D) position-t input from :meth:`embed_step`; caches: tuple
        of (k, v[, moe_counts]) per block, k/v (B, T, Hh, hd), the
        counts (B, E) int32 for routed models (see
        :meth:`_Block.decode_step`). ``moe_cap`` must be
        ``SwitchMoE.capacity(T)`` of the full sequence when routed.
        Returns (logits (B, K) f32, caches)."""
        new_caches = []
        for blk, cache in zip(self.blocks, caches):
            if self.n_experts > 0:
                k_c, v_c, counts = cache
            else:
                (k_c, v_c), counts = cache, None
            x, k_c, v_c, counts = blk.decode_step(
                x, k_c, v_c, t, counts, moe_cap
            )
            new_caches.append(
                (k_c, v_c, counts) if self.n_experts > 0 else (k_c, v_c)
            )
        logits = self.head(self.ln_f(x).astype(self.dtype))
        return logits.astype(jnp.float32), tuple(new_caches)


def _unwrap(params):
    """Accept either a bare param tree or a ``{"params": ...}`` variables
    dict (the checkpoint-artifact layout ``pixelcnn.fast_generate`` also
    takes) — the samplers normalize so both call conventions work."""
    try:
        if "params" in params:
            return params["params"]
    except TypeError:
        pass
    return params


def _init_caches(model: TransformerPrior, batch: int, t: int):
    hd = model.dim // model.n_heads
    # caches hold the qkv projections, which come out in the compute
    # dtype (bf16 under --bf16) — f32 caches would fail the
    # dynamic_update_slice dtype check; both attention reads (QK^T and
    # PV) accumulate in f32 via preferred_element_type
    zeros = jnp.zeros((batch, t, model.n_heads, hd), model.dtype)
    if model.n_experts > 0:
        counts = jnp.zeros((batch, model.n_experts), jnp.int32)
        return tuple(
            (zeros, zeros, counts) for _ in range(model.n_layers)
        )
    return tuple((zeros, zeros) for _ in range(model.n_layers))


def _moe_cap(model: TransformerPrior, t: int) -> int:
    """SwitchMoE.capacity(T) without binding the module — the static
    capacity the cached decode must apply to match teacher forcing."""
    if model.n_experts <= 0:
        return 0
    return max(
        1, int(np.ceil(model.capacity_factor * t / model.n_experts))
    )


def _sample_fn(model: TransformerPrior, H: int, W: int, batch_size: int,
               temperature: float):
    T = H * W

    cap = _moe_cap(model, T)

    def sample_fn(params, label, key, cond_map=None):
        cond_flat = (
            cond_map.reshape(batch_size, T, cond_map.shape[-1])
            if cond_map is not None else None
        )

        def body(t, carry):
            prev, caches, out = carry
            x = model.apply(
                {"params": params}, prev, label, t, H, W,
                cond_flat[:, t] if cond_flat is not None else None,
                method=TransformerPrior.embed_step,
            )
            logits, caches = model.apply(
                {"params": params}, x, caches, t, cap,
                method=TransformerPrior.decode_step,
            )
            tok = jax.random.categorical(
                jax.random.fold_in(key, t), logits / temperature, axis=-1
            ).astype(jnp.int32)
            out = lax.dynamic_update_slice(out, tok[:, None], (0, t))
            return tok, caches, out

        out0 = jnp.zeros((batch_size, T), jnp.int32)
        prev0 = jnp.zeros((batch_size,), jnp.int32)
        _, _, out = lax.fori_loop(
            0, T, body, (prev0, _init_caches(model, batch_size, T), out0))
        return out.reshape(batch_size, H, W)

    return sample_fn


_SAMPLE_CACHE: dict = {}


def generate(
    model: TransformerPrior,
    params,
    label: jnp.ndarray,
    key: jax.Array,
    shape: Tuple[int, int] = (8, 8),
    batch_size: int = 64,
    cond_map=None,
    temperature: float = 1.0,
) -> jnp.ndarray:
    """KV-cached ancestral sampling of (H, W) code grids, fully on device.
    API-compatible with ``pixelcnn.fast_generate`` (plus ``temperature``)."""
    H, W = shape
    sig = (model, H, W, batch_size, float(temperature),
           cond_map is not None)
    fn = _SAMPLE_CACHE.get(sig)
    if fn is None:
        fn = jax.jit(_sample_fn(model, H, W, batch_size, temperature))
        _SAMPLE_CACHE[sig] = fn
    return fn(_unwrap(params), jnp.asarray(label, jnp.int32), key, cond_map)


def incremental_logits(model: TransformerPrior, params, codes, label,
                       cond_map=None):
    """Teacher-forced logits computed through the cached decode path —
    the parity oracle for the sampler (mirrors
    ``pixelcnn.incremental_logits``). Returns (B, H, W, K) f32."""
    params = _unwrap(params)
    b, h, w = codes.shape
    T = h * w
    seq = jnp.asarray(codes).reshape(b, T)
    cond_flat = (
        cond_map.reshape(b, T, cond_map.shape[-1])
        if cond_map is not None else None
    )

    cap = _moe_cap(model, T)

    def body(t, carry):
        caches, out = carry
        prev = seq[:, jnp.maximum(t - 1, 0)]   # ignored at t=0 (BOS)
        x = model.apply(
            {"params": params}, prev, label, t, h, w,
            cond_flat[:, t] if cond_flat is not None else None,
            method=TransformerPrior.embed_step,
        )
        logits, caches = model.apply(
            {"params": params}, x, caches, t, cap,
            method=TransformerPrior.decode_step,
        )
        out = lax.dynamic_update_slice(out, logits[:, None, :], (0, t, 0))
        return caches, out

    out0 = jnp.zeros((b, T, model.input_dim), jnp.float32)

    @jax.jit
    def run(params):
        _, out = lax.fori_loop(0, T, body, (_init_caches(model, b, T), out0))
        return out

    return run(params).reshape(b, h, w, model.input_dim)
