"""WaveNet vocoder: gated dilated causal convolutions over samples.

The reference's entire "vocoder" configuration surface points at a WaveNet
(``builder="wavenet"``, layers=24, stacks=4, residual/gate 512, skip 256,
kernel 3, MoL out_channels=10*3, upsample_scales [4,4,4,4], cin/gin
conditioning — src/hparams.py:52-84) but ships no implementation; the
model itself lives in an external submodule that is empty on disk
(SURVEY §0). This module provides the real thing, TPU-first:

  * Training is fully parallel teacher forcing: every dilated conv is one
    XLA conv op over the whole utterance (NWC layout) with causal padding
    — no sequential work at train time.
  * Mel conditioning is upsampled to sample rate by a stack of transposed
    convs with the configured scales (prod(scales) == hop_size).
  * Output heads: mixture-of-logistics for scalar input (paired with
    ``training.losses.discretized_mix_logistic_loss``) or categorical
    softmax for mulaw-quantize.
  * Generation is a single ``lax.scan`` over time steps with per-layer
    rolling dilation buffers (fast-WaveNet queues) — compiled once, no
    Python loop.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.layers import (
    ConvTranspose, conv_kernel_init)


def _dilations(layers: int, stacks: int) -> Sequence[int]:
    """Dilation schedule: doubling within each stack (hparams layers=24,
    stacks=4 -> 4 cycles of [1, 2, 4, 8, 16, 32])."""
    per_stack = layers // stacks
    return [2 ** (i % per_stack) for i in range(layers)]


class ConditionUpsampler(nn.Module):
    """Mel frames (B, T', C) -> per-sample conditioning (B, T'*prod, C)
    via transposed convs (upsample_conditional_features,
    src/hparams.py:73-78)."""

    scales: Tuple[int, ...] = (4, 4, 4, 4)
    channels: int = 80

    @nn.compact
    def __call__(self, c: jnp.ndarray) -> jnp.ndarray:
        for s in self.scales:
            c = ConvTranspose(
                self.channels,
                (2 * s,),
                strides=(s,),
                padding="SAME",
                kernel_init=conv_kernel_init,
            )(c)
            c = nn.leaky_relu(c, 0.4)
        return c


class WaveNet(nn.Module):
    """Configuration mirrors the reference hparams block
    (src/hparams.py:52-84)."""

    out_channels: int = 30  # 10 mixtures x 3, or quantize_channels
    layers: int = 24
    stacks: int = 4
    residual_channels: int = 128
    gate_channels: int = 128
    skip_out_channels: int = 128
    kernel_size: int = 3
    cin_channels: int = 80  # -1 disables local conditioning
    gin_channels: int = -1
    n_speakers: int = 7
    upsample_scales: Tuple[int, ...] = (4, 4, 4, 4)
    scalar_input: bool = True  # raw/mulaw in [-1,1]; else one-hot ints
    quantize_channels: int = 256
    # bf16 teacher-forced compute (params stay f32; the MoL/CE loss head
    # returns f32 logits) — cli/vocoder.py train --bf16
    dtype: Any = jnp.float32

    def setup(self):
        self.first_conv = nn.Conv(
            self.residual_channels, (1,), kernel_init=conv_kernel_init,
            dtype=self.dtype, name="first_conv",
        )
        if not self.scalar_input:
            self.input_embed = nn.Embed(
                self.quantize_channels, self.residual_channels
            )
        dil = _dilations(self.layers, self.stacks)
        self.dilation_rates = tuple(dil)
        self.dilated_convs = [
            nn.Conv(
                self.gate_channels,
                (self.kernel_size,),
                kernel_dilation=(d,),
                padding=(((self.kernel_size - 1) * d, 0),),  # causal
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name=f"dilated_{i}",
            )
            for i, d in enumerate(dil)
        ]
        self.res_convs = [
            nn.Conv(self.residual_channels, (1,), kernel_init=conv_kernel_init,
                    dtype=self.dtype, name=f"res_{i}")
            for i in range(self.layers)
        ]
        self.skip_convs = [
            nn.Conv(self.skip_out_channels, (1,), kernel_init=conv_kernel_init,
                    dtype=self.dtype, name=f"skip_{i}")
            for i in range(self.layers)
        ]
        if self.cin_channels > 0:
            self.upsampler = ConditionUpsampler(
                self.upsample_scales, self.cin_channels
            )
            self.cond_convs = [
                nn.Conv(self.gate_channels, (1,), use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name=f"cond_{i}")
                for i in range(self.layers)
            ]
        if self.gin_channels > 0:
            self.speaker_embed = nn.Embed(self.n_speakers, self.gin_channels)
            self.g_convs = [
                nn.Conv(self.gate_channels, (1,), use_bias=False,
                        kernel_init=conv_kernel_init, dtype=self.dtype,
                        name=f"g_{i}")
                for i in range(self.layers)
            ]
        self.post1 = nn.Conv(self.skip_out_channels, (1,),
                             kernel_init=conv_kernel_init, dtype=self.dtype,
                             name="post1")
        self.post2 = nn.Conv(self.out_channels, (1,),
                             kernel_init=conv_kernel_init, dtype=self.dtype,
                             name="post2")

    def _embed(self, x):
        if self.scalar_input:
            return self.first_conv(x)  # (B, T, 1) -> (B, T, R)
        return self.first_conv(self.input_embed(x))  # ints -> (B, T, R)

    def _gate(self, z, c_l, g_l):
        if c_l is not None:
            z = z + c_l
        if g_l is not None:
            z = z + g_l
        a, b = jnp.split(z, 2, axis=-1)
        return jnp.tanh(a) * jax.nn.sigmoid(b)

    def __call__(
        self,
        x: jnp.ndarray,
        c: Optional[jnp.ndarray] = None,
        g: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Teacher-forced forward.

        x: inputs at t (the caller shifts targets; see ``shift_inputs``),
        (B, T, 1) floats or (B, T) ints. c: mel (B, T', cin). g: (B,) ints.
        Returns (B, T, out_channels) predictions for each t.
        """
        h = self._embed(x)
        c_up = None
        if c is not None and self.cin_channels > 0:
            c_up = self.upsampler(c)
            c_up = c_up[:, : h.shape[1], :]
        g_emb = None
        if g is not None and self.gin_channels > 0:
            g_emb = self.speaker_embed(g)[:, None, :]  # (B, 1, gin)

        skips = 0.0
        for i in range(self.layers):
            z = self.dilated_convs[i](h)
            c_l = self.cond_convs[i](c_up) if c_up is not None else None
            g_l = self.g_convs[i](g_emb) if g_emb is not None else None
            gated = self._gate(z, c_l, g_l)
            skips = skips + self.skip_convs[i](gated)
            h = h + self.res_convs[i](gated)

        out = nn.relu(skips)
        out = nn.relu(self.post1(out))
        # the MoL/CE loss is numerically sensitive — logits return f32
        return self.post2(out).astype(jnp.float32)

    @staticmethod
    def shift_inputs(targets: jnp.ndarray, scalar: bool) -> jnp.ndarray:
        """Teacher forcing: input at step t is the target at t-1."""
        if scalar:
            return jnp.pad(targets[:, :-1], ((0, 0), (1, 0), (0, 0)))
        return jnp.pad(targets[:, :-1], ((0, 0), (1, 0)))


def _stack_step_params(model: WaveNet, params, dtype=None):
    """Stack the per-layer 1x1/tap weights into (L, ...) tensors so the
    generation scan body runs a few BATCHED matmuls instead of ~6 small
    ones per layer (~150 tiny ops per sample at layers=24 — the
    dispatch/latency floor that kept single-stream generation below
    realtime; round-2 verdict item #3). Stacking happens once per
    generate call, outside the scan."""
    import jax.numpy as jnp

    L = model.layers
    K = model.kernel_size

    def stack(fmt, leaf="kernel"):
        return jnp.stack([params[fmt.format(i)][leaf] for i in range(L)])

    dil = stack("dilated_{}")          # (L, K, R, G)
    s = {
        "w_cur": dil[:, K - 1],        # (L, R, G)
        "w_tap": jnp.moveaxis(dil[:, : K - 1], 1, 0),  # (K-1, L, R, G)
        "b_dil": stack("dilated_{}", "bias"),          # (L, G)
        "w_skip": stack("skip_{}")[:, 0],              # (L, G/2, S)
        "b_skip": stack("skip_{}", "bias"),            # (L, S)
        "w_res": stack("res_{}")[:, 0],                # (L, G/2, R)
        "b_res": stack("res_{}", "bias"),              # (L, R)
    }
    if model.cin_channels > 0 and "cond_0" in params:
        s["w_cond"] = stack("cond_{}")[:, 0]           # (L, C, G)
    if model.gin_channels > 0 and "g_0" in params:
        s["w_g"] = stack("g_{}")[:, 0]                 # (L, gin, G)
    if dtype is not None:
        s = {k: v.astype(dtype) for k, v in s.items()}
    return s


def _step_core(model: WaveNet, params, dilations, dtype=None):
    """Single-timestep network evaluation with a fused rolling buffer.

    Returns step(h_in, buf, c_t, g_emb) -> (logits, new_buf) where h_in
    is the embedded current input (B, R) and buf is ONE (L, B, rmax, R)
    ring of past layer inputs (rmax = the largest dilation span).

    Per step: the K-1 dilated taps for ALL layers come out of the ring
    with one gather per tap + one einsum; conditioning biases are one
    einsum; the skip reduction is one einsum over the collected gated
    activations. Only the residual chain (h -> layer i -> h) stays
    sequential — it is data-dependent by construction."""
    import jax
    import jax.numpy as jnp

    K = model.kernel_size
    L = model.layers
    stacked = _stack_step_params(model, params, dtype)
    rmax = (K - 1) * max(dilations) if K > 1 else 1
    # tap_idx[j, l]: ring position of tap j for layer l (static)
    tap_idx = jnp.asarray(
        [[rmax - d * (K - 1 - j) for d in dilations] for j in range(K - 1)],
        jnp.int32,
    )

    def dense(name, x):
        w = params[name]["kernel"]
        b = params[name].get("bias")
        y = x @ w[0] if w.ndim == 3 else x @ w
        return y + b if b is not None else y

    def step(h, buf, c_t, g_emb):
        if dtype is not None:
            h = h.astype(dtype)
        # ---- batched-over-layers part (no cross-layer dependence) ----
        # taps: (K-1, L, B, R) gathered from the ring at static offsets
        if K > 1:
            taps = jnp.take_along_axis(
                buf[None], tap_idx[:, :, None, None, None], axis=3
            )[:, :, :, 0, :]
            pre = jnp.einsum("jlbr,jlrg->lbg", taps, stacked["w_tap"])
        else:
            pre = 0.0
        pre = pre + stacked["b_dil"][:, None, :]
        if c_t is not None:
            pre = pre + jnp.einsum(
                "bc,lcg->lbg", c_t.astype(h.dtype), stacked["w_cond"]
            )
        if g_emb is not None:
            pre = pre + jnp.einsum(
                "bc,lcg->lbg", g_emb.astype(h.dtype), stacked["w_g"]
            )
        # ---- sequential residual chain (2 matmuls per layer) ----
        h_ins = []
        gateds = []
        for i in range(L):
            h_ins.append(h)
            z = h @ stacked["w_cur"][i] + pre[i]
            a_, b_ = jnp.split(z, 2, axis=-1)
            gated = jnp.tanh(a_) * jax.nn.sigmoid(b_)
            gateds.append(gated)
            h = h + gated @ stacked["w_res"][i] + stacked["b_res"][i]
        # ---- batched epilogue: one skip einsum, shift the ring once ----
        skips = (
            jnp.einsum("lbg,lgs->bs", jnp.stack(gateds), stacked["w_skip"])
            + stacked["b_skip"].sum(0)
        )
        new_buf = jnp.concatenate(
            [buf[:, :, 1:, :], jnp.stack(h_ins)[:, :, None, :]], axis=2
        )
        out = jax.nn.relu(skips.astype(jnp.float32))
        out = jax.nn.relu(dense("post1", out))
        return dense("post2", out), new_buf

    return step


def _embed_one(model: WaveNet, params, x_t):
    """Embed one input sample (B, 1) float / (B,) int -> (B, R)."""
    w = params["first_conv"]["kernel"]
    b = params["first_conv"]["bias"]
    if model.scalar_input:
        return x_t @ w[0] + b
    emb = params["input_embed"]["embedding"][x_t]
    return emb @ w[0] + b


def _init_buffers(model: WaveNet, dilations, batch_size: int, dtype=None):
    """One fused (L, B, rmax, R) ring of past layer inputs."""
    import jax.numpy as jnp

    K = model.kernel_size
    rmax = (K - 1) * max(dilations) if K > 1 else 1
    return jnp.zeros(
        (model.layers, batch_size, rmax, model.residual_channels),
        dtype or jnp.float32,
    )


def _upsample_cond(model: WaveNet, variables, c):
    if c is None or model.cin_channels <= 0:
        return None
    return model.apply(variables, c, method=lambda m, c_: m.upsampler(c_))


def _embed_speaker(model: WaveNet, variables, g):
    if g is None or model.gin_channels <= 0:
        return None
    return model.apply(variables, g, method=lambda m, g_: m.speaker_embed(g_))


_LOG_SCALE_MIN = -32.23619130191664  # losses.py MoL floor


def _sample_from_logits(model: WaveNet, logits, gum_t, u_t):
    """One sampling step from per-sample logits with PRE-DRAWN noise:
    gumbel-max mixture choice + inverse-CDF logistic for MoL
    (scalar_input), gumbel-max over categorical logits otherwise.
    Returns (out, next_input).

    Shared by the monolithic sampler, the chunked/streaming sampler, and
    the stream mux — their documented bit-parity rests on this being ONE
    body (a clamp or dtype fix applied to a divergent copy would silently
    break the chunked-parity contract)."""
    if model.scalar_input:
        logit_probs, means, log_scales = jnp.split(logits, 3, -1)
        comp = jnp.argmax(logit_probs + gum_t, axis=-1)
        mean = jnp.take_along_axis(means, comp[..., None], -1)[..., 0]
        log_scale = jnp.maximum(
            jnp.take_along_axis(log_scales, comp[..., None], -1)[..., 0],
            _LOG_SCALE_MIN,
        )
        x = mean + jnp.exp(log_scale) * (jnp.log(u_t) - jnp.log1p(-u_t))
        out = jnp.clip(x, -1.0, 1.0)
        return out, out[:, None]
    out = jnp.argmax(logits + gum_t, axis=-1)
    return out, out


def _draw_noise(model: WaveNet, key, length: int, batch_size: int = 1):
    """ALL sampling noise as one scan-major batched draw: a serial
    jax.random.split chain inside the scan costs ~8us/step of threefry
    latency on TPU (measured; PERF.md) — more than the whole 24-layer
    residual chain. One layout for every sampler (bit-parity)."""
    k1, k2 = jax.random.split(key)
    if model.scalar_input:
        n_mix = model.out_channels // 3
        gum = jax.random.gumbel(k1, (length, batch_size, n_mix))
        unif = jax.random.uniform(
            k2, (length, batch_size), minval=1e-5, maxval=1.0 - 1e-5
        )
    else:
        gum = jax.random.gumbel(k1, (length, batch_size, model.out_channels))
        unif = jnp.zeros((length, batch_size))
    return gum, unif


def incremental_forward(model: WaveNet, variables, x, c=None, g=None):
    """Teacher-forced evaluation through the *incremental* buffered path.

    Must produce logits identical to ``model.apply(variables, x, c, g)``
    — the equivalence test for the fast-generation queues. x: (B, T, 1)
    floats or (B, T) ints.
    """
    import jax
    import jax.numpy as jnp

    dilations = _dilations(model.layers, model.stacks)
    params = variables["params"]
    step_core = _step_core(model, params, dilations)
    c_up = _upsample_cond(model, variables, c)
    g_emb = _embed_speaker(model, variables, g)
    batch = x.shape[0]

    def step(carry, t):
        buf = carry
        h = _embed_one(model, params, x[:, t])
        c_t = c_up[:, t, :] if c_up is not None else None
        logits, buf = step_core(h, buf, c_t, g_emb)
        return buf, logits

    _, logits = jax.lax.scan(
        step, _init_buffers(model, dilations, batch), jnp.arange(x.shape[1])
    )
    return jnp.transpose(logits, (1, 0, 2))  # (B, T, out)


def make_generate_fn(model: WaveNet, length: int, dtype=None,
                     use_pallas: Optional[bool] = None,
                     unroll: Optional[int] = None):
    """Build a jitted ancestral sampler: generate(variables, c, g, key,
    batch_size) -> (B, length) samples (floats for scalar output via MoL
    sampling; ints for categorical).

    The production path is the XLA ``lax.scan`` sampler with a batched
    step body (one stacked tap einsum + per-layer residual matmuls) and
    ``unroll`` steps per scan iteration — unrolling amortizes the
    loop-carried bookkeeping XLA emits around each step, the dominant
    cost at batch 1 (measured on v5e; PERF.md "single-stream
    generation").

    ``use_pallas=True`` opts into the fused whole-loop Pallas kernel
    (ops/pallas/wavenet_gen.py) for qualifying shapes (batch-1
    mel-conditioned MoL). Measured slower than the unrolled scan on v5e
    — see that module's docstring — so it is no longer auto-selected.

    ``dtype=jnp.bfloat16`` runs the scan path's per-step matmuls
    (stacked weights + residual state + ring buffer) in bf16 — roughly
    halves the weight-bytes each sample must stream from HBM; the
    MoL/softmax head and the sampling itself stay f32."""
    import jax
    import jax.numpy as jnp

    dilations = _dilations(model.layers, model.stacks)
    if unroll is None:
        # bf16 sweep on v5e at 16384 samples (PERF.md "single-stream
        # generation"): unroll 1/4/8/16/32/64/128 -> 0.79/0.97/1.31/
        # 1.60/1.79/1.84/0.71x realtime; 64 costs a 321 s compile for
        # +3%, 128 falls off a scheduling cliff. 32 is the knee.
        unroll = 32

    def generate(variables, c, g, key, batch_size=1):
        params = variables["params"]
        step_core = _step_core(model, params, dilations, dtype=dtype)
        c_up = _upsample_cond(model, variables, c)
        g_emb = _embed_speaker(model, variables, g)

        gumbel, unif = _draw_noise(model, key, length, batch_size)

        def step(carry, xs):
            prev, buf = carry
            t, gum_t, u_t = xs
            h = _embed_one(model, params, prev)
            c_t = c_up[:, t, :] if c_up is not None else None
            logits, buf = step_core(h, buf, c_t, g_emb)
            out, nxt = _sample_from_logits(model, logits, gum_t, u_t)
            return (nxt, buf), out

        init = (
            jnp.zeros((batch_size, 1))
            if model.scalar_input
            else jnp.zeros((batch_size,), jnp.int32)
        )
        (_, _), samples = jax.lax.scan(
            step,
            (init, _init_buffers(model, dilations, batch_size, dtype)),
            (jnp.arange(length), gumbel, unif),
            unroll=unroll,
        )
        return samples.T if samples.ndim == 2 else jnp.swapaxes(samples, 0, 1)

    scan_fn = jax.jit(generate, static_argnames=("batch_size",))

    from neural_sound_generation_tpu.ops.pallas.wavenet_gen import (
        pallas_generate,
        pallas_generate_supported,
    )

    if use_pallas is None:
        # the unrolled scan beats every variant of the fused kernel on
        # v5e (~46 us/step vs 70-95; PERF.md "single-stream
        # generation"), so the kernel is opt-in only
        use_pallas = False
    if not use_pallas:
        return scan_fn
    assert pallas_generate_supported(model, 1), (
        "use_pallas=True but the model shapes don't qualify "
        "(see ops/pallas/wavenet_gen.pallas_generate_supported)"
    )

    def pallas_path(variables, c, key):
        c_up = _upsample_cond(model, variables, c)[0]
        seed = jax.random.randint(
            key, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
        )
        return pallas_generate(model, variables, c_up, seed, length)[None]

    pallas_jit = jax.jit(pallas_path)

    def dispatch(variables, c, g, key, batch_size=1):
        if batch_size == 1 and g is None and c is not None:
            return pallas_jit(variables, c, key)
        return scan_fn(variables, c, g, key, batch_size=batch_size)

    return dispatch


def make_chunked_generate_fn(model: WaveNet, chunk: int, dtype=None,
                             unroll: Optional[int] = None):
    """Streaming ancestral sampler: ONE compiled program per
    (chunk, batch) shape serves utterances of ANY length.

    The monolithic sampler (``make_generate_fn``) compiles a program per
    output length — ~30 s per new length through a cold cache at the
    production unroll. This factory instead carries the generation state
    (previous sample + the fused dilation ring) across fixed-size chunk
    calls, so a server synthesizes arbitrary-length and even unbounded
    (live) streams with a single compile, emitting audio incrementally
    with ``chunk / sample_rate`` seconds of latency per piece.

    Returns ``(init_state, step_chunk, stream)``:

    * ``init_state(batch_size)`` -> opaque carry.
    * ``step_chunk(variables, state, c_up_chunk, gum, unif, g_emb,
      batch_size)`` -> ``(state, samples)`` — jitted; ``c_up_chunk`` is
      the (B, chunk, C) slice of the *upsampled* conditioning, ``gum``/
      ``unif`` the pre-drawn noise for these steps (shapes as drawn by
      ``draw_noise``).
    * ``stream(variables, c, g, key, batch_size)`` — generator yielding
      (B, chunk) sample blocks until the mel-determined length is
      covered (final block trimmed). Bit-identical to
      ``make_generate_fn(model, length, dtype, use_pallas=False,
      unroll=unroll)`` with the same key: the noise is drawn once for
      the full length exactly as the monolithic path draws it
      (tests/test_wavenet.py chunked-parity).
    """
    import jax
    import jax.numpy as jnp

    dilations = _dilations(model.layers, model.stacks)
    if unroll is None:
        unroll = 32 if chunk % 32 == 0 else 1

    def init_state(batch_size: int = 1):
        prev = (
            jnp.zeros((batch_size, 1))
            if model.scalar_input
            else jnp.zeros((batch_size,), jnp.int32)
        )
        return prev, _init_buffers(model, dilations, batch_size, dtype)

    def _step_chunk(variables, state, c_chunk, gum, unif, g_emb):
        params = variables["params"]
        step_core = _step_core(model, params, dilations, dtype=dtype)

        def step(carry, xs):
            prev, buf = carry
            c_t, gum_t, u_t = xs
            h = _embed_one(model, params, prev)
            logits, buf = step_core(
                h, buf, c_t if model.cin_channels > 0 else None, g_emb
            )
            out, nxt = _sample_from_logits(model, logits, gum_t, u_t)
            return (nxt, buf), out

        # (B, chunk, C) -> scan-major (chunk, B, C); zeros placeholder
        # when unconditioned keeps the signature static
        xs_c = (
            jnp.swapaxes(c_chunk, 0, 1)
            if model.cin_channels > 0
            else jnp.zeros((chunk, 1, 1))
        )
        state, samples = jax.lax.scan(
            step, state, (xs_c, gum, unif), unroll=unroll
        )
        out = (
            samples.T if samples.ndim == 2 else jnp.swapaxes(samples, 0, 1)
        )
        return state, out

    step_chunk = jax.jit(_step_chunk)

    def draw_noise(key, length: int, batch_size: int = 1):
        """Exactly the monolithic sampler's noise layout (scan-major)."""
        return _draw_noise(model, key, length, batch_size)

    # jitted per (mel-length, batch) shape: the eager flax apply runs the
    # upsampler op-by-op, and over the TPU tunnel every eager op pays a
    # dispatch round trip — hundreds of ms on the serving first-chunk path
    _upsample_jit = jax.jit(
        lambda variables, c_: _upsample_cond(model, variables, c_)
    )

    def stream(variables, c, g, key, batch_size: int = 1):
        c_up = (
            _upsample_jit(variables, c)  # (B, T, C)
            if c is not None and model.cin_channels > 0
            else None
        )
        g_emb = _embed_speaker(model, variables, g)
        if c_up is None:
            raise ValueError(
                "stream() needs local conditioning to bound the length; "
                "drive step_chunk directly for unconditioned streams"
            )
        length = int(c_up.shape[1])
        gum, unif = draw_noise(key, length, batch_size)
        n_chunks = -(-length // chunk)
        pad = n_chunks * chunk - length
        if pad:
            c_up = jnp.pad(c_up, ((0, 0), (0, pad), (0, 0)))
            gum = jnp.pad(gum, ((0, pad),) + ((0, 0),) * (gum.ndim - 1))
            # padded uniforms must stay inside (0, 1): log(u), log1p(-u)
            unif = jnp.pad(unif, ((0, pad), (0, 0)), constant_values=0.5)
        state = init_state(batch_size)
        done = 0
        for i in range(n_chunks):
            sl = slice(i * chunk, (i + 1) * chunk)
            state, out = step_chunk(
                variables, state, c_up[:, sl], gum[sl], unif[sl], g_emb
            )
            yield out[:, : min(chunk, length - done)]
            done += chunk

    return init_state, step_chunk, stream
