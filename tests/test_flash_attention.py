"""Flash-attention Pallas kernels vs the stock XLA oracle.

The kernels (ops/pallas/attention.py) are the TPU training path for the
TransformerPrior; on CPU they run in Pallas interpreter mode. Parity is
checked against the explicit masked-softmax XLA path for forward AND
the full custom-vjp backward (dq/dk/dv), across ragged T (pad masking),
unequal tile sizes, and bf16 inputs."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.ops.pallas import attention as fa


def _qkv(rng, b=2, h=2, t=80, d=8, dtype=jnp.float32):
    def one():
        return jnp.asarray(
            rng.standard_normal((b, h, t, d)), jnp.float32
        ).astype(dtype)
    return one(), one(), one()


def _flash(q, k, v, scale, bq):
    b, h, t, d = q.shape
    flat = lambda x: x.reshape(b * h, t, d)
    o = fa.flash_causal_attention(
        flat(q), flat(k), flat(v), scale, bq, True)  # interpret
    return o.reshape(b, h, t, d)


@pytest.mark.parametrize("t,bq", [
    (80, 32),    # ragged tail: Tp=96, 3 tiles (unrolled regime)
    (64, 32),    # exact tiling
    (80, 16),    # 5 tiles -> fori_loop regime (> _MAX_UNROLL)
    (20, 32),    # single partial tile
    (200, 16),   # 13 tiles, deep loop regime
])
def test_forward_parity(rng, t, bq):
    q, k, v = _qkv(rng, t=t)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = fa._xla_causal_attention(q, k, v, scale)
    out = _flash(q, k, v, scale, bq)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("t,bq", [(80, 32), (80, 16), (200, 16)])
def test_backward_parity(rng, t, bq):
    q, k, v = _qkv(rng, t=t)
    scale = 1.0 / np.sqrt(q.shape[-1])
    co = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(fa._xla_causal_attention(q, k, v, scale) * co)

    def loss_flash(q, k, v):
        return jnp.sum(_flash(q, k, v, scale, bq) * co)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", g_fl, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4,
            err_msg=f"d{name}")


def test_bf16_inputs_close_to_f32_oracle(rng):
    q, k, v = _qkv(rng, t=48, dtype=jnp.bfloat16)
    scale = 1.0 / np.sqrt(q.shape[-1])
    ref = fa._xla_causal_attention(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), scale)
    out = _flash(q, k, v, scale, 32)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2)


def test_causality_of_kernel(rng):
    """Perturbing key/value at position j must not change outputs at
    rows < j (kernel-level causality, independent of the model test)."""
    q, k, v = _qkv(rng, b=1, h=1, t=40)
    scale = 0.5
    base = np.asarray(_flash(q, k, v, scale, 16))[0, 0]
    k2 = k.at[0, 0, 25].add(3.0)
    v2 = v.at[0, 0, 25].add(3.0)
    out = np.asarray(_flash(q, k2, v2, scale, 16))[0, 0]
    d = np.abs(base - out).max(axis=-1)
    assert d[:25].max() == 0.0
    assert d[25:].max() > 0.0


def test_backend_dispatch(rng, monkeypatch):
    """auto on CPU -> XLA path; forcing 'xla' matches auto; the
    set_backend guard rejects unknown names."""
    q, k, v = _qkv(rng, t=24)
    a = fa.causal_attention(q, k, v)
    fa.set_backend("xla")
    try:
        b = fa.causal_attention(q, k, v)
    finally:
        fa.set_backend("auto")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(AssertionError):
        fa.set_backend("nope")


def test_transformer_prior_uses_dispatcher(rng):
    """The model path goes through causal_attention: forcing the flash
    backend in interpreter mode must reproduce the stock-XLA logits."""
    from neural_sound_generation_tpu.models import TransformerPrior

    m = TransformerPrior(input_dim=16, dim=32, n_layers=2, n_heads=4,
                         n_classes=3)
    codes = jnp.asarray(rng.integers(0, 16, (2, 4, 5)), jnp.int32)
    lab = jnp.asarray([0, 2], jnp.int32)
    variables = m.init(jax.random.PRNGKey(0), codes, lab)
    ref = np.asarray(m.apply(variables, codes, lab))
    # route the flash kernels through the interpreter on CPU
    orig = fa.flash_causal_attention

    def interp(q, k, v, scale, bq=fa.BLOCK_Q, interpret=False):
        return orig(q, k, v, scale, bq, True)

    fa.set_backend("flash")
    try:
        import neural_sound_generation_tpu.models.transformer_prior as tp
        # the model module imported the dispatcher by name; patch the
        # kernel entry the dispatcher calls
        old = fa.flash_causal_attention
        fa.flash_causal_attention = interp
        try:
            out = np.asarray(m.apply(variables, codes, lab))
        finally:
            fa.flash_causal_attention = old
    finally:
        fa.set_backend("auto")
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)


@pytest.mark.parametrize("t,block", [(37, 16), (64, 32), (300, 128)])
def test_chunked_matches_xla(rng, t, block):
    """chunked_causal_attention (online softmax over KV chunks, q-block
    remat) == stock XLA masked softmax — values AND gradients, incl.
    non-dividing T (padding rows/keys masked)."""
    b, h, d = 2, 2, 16
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    scale = 1.0 / np.sqrt(d)
    want = fa._xla_causal_attention(q, k, v, scale)
    got = fa.chunked_causal_attention(q, k, v, scale, block=block)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5, rtol=1e-5
    )

    co = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def loss(fn):
        return lambda q_, k_, v_: jnp.sum(fn(q_, k_, v_, scale) * co)

    gw = jax.grad(loss(fa._xla_causal_attention), argnums=(0, 1, 2))(q, k, v)
    gg = jax.grad(
        loss(lambda a, b_, c, s: fa.chunked_causal_attention(
            a, b_, c, s, block=block)),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, b_ in zip(gw, gg):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=3e-5, rtol=1e-4
        )


def test_chunked_backend_dispatch(rng):
    """set_backend('chunked') routes causal_attention through the
    linear-memory path with identical results."""
    b, h, t, d = 1, 2, 50, 8
    q = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, d)), jnp.float32)
    ref = np.asarray(fa.causal_attention(q, k, v))
    fa.set_backend("chunked")
    try:
        out = np.asarray(fa.causal_attention(q, k, v))
    finally:
        fa.set_backend("auto")
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-5)
