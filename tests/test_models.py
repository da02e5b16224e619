"""Model tests: shapes, gradient flow, conditioning, and PixelCNN causality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models import VAE, VQVAE, GatedPixelCNN
from neural_sound_generation_tpu.models.pixelcnn import generate


def _mel_batch(rng, b=2, h=80, w=64):
    # NHWC mel batch: (B, num_mels, frames, 1)
    return jnp.asarray(rng.standard_normal((b, h, w, 1)).astype(np.float32))


# --------------------------------------------------------------------- VQVAE


def test_vqvae_forward_shapes(rng):
    x = _mel_batch(rng)
    model = VQVAE(input_dim=1, dim=32, z_dim=64)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    (x_tilde, z_e, z_q), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert x_tilde.shape == x.shape  # W multiple of 4 -> exact roundtrip
    assert z_e.shape == (2, 20, 16, 32)
    assert z_q.shape == z_e.shape
    assert np.isfinite(np.asarray(x_tilde)).all()


def test_vqvae_encode_decode(rng):
    x = _mel_batch(rng)
    model = VQVAE(input_dim=1, dim=32, z_dim=64)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    idx = model.apply(variables, x, train=False, method=VQVAE.encode)
    assert idx.shape == (2, 20, 16)
    assert idx.dtype == jnp.int32
    assert int(idx.min()) >= 0 and int(idx.max()) < 64
    recon = model.apply(variables, idx, train=False, method=VQVAE.decode)
    assert recon.shape == x.shape


def test_vqvae_three_term_loss_grads_flow(rng):
    """Reconstruction grads reach encoder+decoder via STE; vq loss reaches
    the codebook; commit loss reaches the encoder (train.py:129-134)."""
    x = _mel_batch(rng)
    model = VQVAE(input_dim=1, dim=16, z_dim=32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    def loss_fn(params):
        (x_tilde, z_e, z_q), _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            x,
            train=True,
            mutable=["batch_stats"],
        )
        loss_recons = jnp.mean((x_tilde - x) ** 2)
        loss_vq = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        loss_commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        return loss_recons + loss_vq + 1.0 * loss_commit

    grads = jax.jit(jax.grad(loss_fn))(params)
    flat = jax.tree_util.tree_leaves_with_path(grads)
    norms = {jax.tree_util.keystr(k): float(jnp.linalg.norm(v)) for k, v in flat}
    assert norms["['codebook']"] > 0
    enc_norm = sum(v for k, v in norms.items() if "encoder" in k)
    dec_norm = sum(v for k, v in norms.items() if "decoder" in k)
    assert enc_norm > 0 and dec_norm > 0


def test_vqvae_speaker_conditioning_changes_output(rng):
    x = _mel_batch(rng)
    model = VQVAE(input_dim=1, dim=16, z_dim=32, n_speakers=7, gin_channels=16)
    g0 = jnp.zeros((2,), jnp.int32)
    g1 = jnp.ones((2,), jnp.int32) * 3
    variables = model.init(jax.random.PRNGKey(0), x, train=False, g=g0)
    y0, _ = model.apply(variables, x, train=True, g=g0, mutable=["batch_stats"])
    y1, _ = model.apply(variables, x, train=True, g=g1, mutable=["batch_stats"])
    assert not np.allclose(np.asarray(y0[0]), np.asarray(y1[0]))


def test_vqvae_feature_conditioned_decode(rng):
    model = VQVAE(input_dim=1, dim=16, z_dim=32, cond_features=3)
    x = _mel_batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0), x, train=False, features=jnp.zeros((2, 3))
    )
    feats = jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32))
    out = model.apply(
        variables,
        feats,
        (20, 16),
        train=False,
        method=VQVAE.decode_from_features,
    )
    assert out.shape == (2, 80, 64, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_vqvae_codebook_init_range():
    model = VQVAE(input_dim=1, dim=16, z_dim=32)
    x = jnp.zeros((1, 16, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    cb = np.asarray(variables["params"]["codebook"])
    # U(-1/z_dim, 1/z_dim) init (models.py:125)
    assert cb.min() >= -1 / 32 - 1e-6 and cb.max() <= 1 / 32 + 1e-6
    assert cb.std() > 0


# ----------------------------------------------------------------------- VAE


def test_vae_forward_shapes_and_kl(rng):
    x = _mel_batch(rng, b=2, h=80, w=64)
    model = VAE(input_dim=1, dim=16, z_dim=8)
    variables = model.init(
        jax.random.PRNGKey(0), x, train=False
    )
    (x_tilde, kl), _ = model.apply(
        variables,
        x,
        train=True,
        mutable=["batch_stats"],
        rngs={"sample": jax.random.PRNGKey(1)},
    )
    assert x_tilde.shape == x.shape
    assert float(kl) >= 0
    assert np.isfinite(np.asarray(x_tilde)).all()


def test_vae_eval_deterministic(rng):
    x = _mel_batch(rng, b=1)
    model = VAE(input_dim=1, dim=8, z_dim=4)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    y1, _ = model.apply(variables, x, train=False)
    y2, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


# ------------------------------------------------------------------ PixelCNN


@pytest.fixture(scope="module")
def pixelcnn_setup():
    model = GatedPixelCNN(input_dim=32, dim=16, n_layers=4, n_classes=5)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 32, (2, 8, 8)), jnp.int32)
    label = jnp.asarray([1, 3], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, label)
    return model, variables, x, label


def test_pixelcnn_logits_shape(pixelcnn_setup):
    model, variables, x, label = pixelcnn_setup
    logits = model.apply(variables, x, label)
    assert logits.shape == (2, 8, 8, 32)


def test_pixelcnn_causality(pixelcnn_setup):
    """Logits at (i, j) must not depend on (i, j) itself or any pixel after
    it in raster order — the property the masked convs exist to enforce."""
    model, variables, x, label = pixelcnn_setup
    base = np.asarray(model.apply(variables, x, label))
    i, j = 4, 4

    def flip(xi, ii, jj):
        return xi.at[:, ii, jj].set((xi[:, ii, jj] + 7) % 32)

    # self
    np.testing.assert_allclose(
        np.asarray(model.apply(variables, flip(x, i, j), label))[:, i, j],
        base[:, i, j],
        atol=1e-6,
    )
    # future in same row, and next row
    for (ii, jj) in [(i, j + 1), (i + 1, 0), (i + 1, j)]:
        np.testing.assert_allclose(
            np.asarray(model.apply(variables, flip(x, ii, jj), label))[:, i, j],
            base[:, i, j],
            atol=1e-6,
        )
    # past pixel SHOULD change the logits (sanity that the test can fail)
    changed = np.asarray(model.apply(variables, flip(x, i - 1, j), label))[:, i, j]
    assert not np.allclose(changed, base[:, i, j], atol=1e-6)


def test_pixelcnn_label_conditioning(pixelcnn_setup):
    model, variables, x, label = pixelcnn_setup
    l2 = jnp.asarray([2, 0], jnp.int32)
    a = np.asarray(model.apply(variables, x, label))
    b = np.asarray(model.apply(variables, x, l2))
    assert not np.allclose(a, b)


def test_pixelcnn_generate(pixelcnn_setup):
    model, variables, _, _ = pixelcnn_setup
    label = jnp.asarray([0, 1, 2], jnp.int32)
    out = generate(
        model, variables, label, jax.random.PRNGKey(0), shape=(8, 8), batch_size=3
    )
    out = np.asarray(out)
    assert out.shape == (3, 8, 8)
    assert out.min() >= 0 and out.max() < 32
    out2 = np.asarray(
        generate(
            model, variables, label, jax.random.PRNGKey(0), shape=(8, 8), batch_size=3
        )
    )
    np.testing.assert_array_equal(out, out2)


def test_vqvae_bf16_compute(rng):
    """bfloat16 compute dtype: finite float32 outputs, train step works."""
    import jax.numpy as jnp
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.training import create_train_state, make_train_step

    model = VQVAE(input_dim=1, dim=16, z_dim=32, dtype=jnp.bfloat16)
    # structured (learnable) input: pure iid noise makes the 10-step
    # loss-decrease assertion a coin flip on bf16 accumulation order
    # (stock vs edge conv lowering differ in the 4th decimal by step 6)
    t = np.linspace(0, 1, 16)[None, :, None, None]
    x = jnp.asarray(
        (0.5 * np.sin(2 * np.pi * 4 * t)
         + 0.1 * rng.standard_normal((2, 16, 16, 1))).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # params remain float32
    assert variables["params"]["encoder"]["Conv_0"]["kernel"].dtype == jnp.float32
    (x_tilde, z_e, z_q), _ = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert x_tilde.dtype == jnp.float32  # output upcast for the loss
    assert z_e.dtype == jnp.float32  # VQ in f32
    assert np.isfinite(np.asarray(x_tilde)).all()

    cfg = Config()
    state = create_train_state(variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for i in range(40):
        state, m = step(state, {"x": x}, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] and np.isfinite(losses[-1])


def test_vqvae_bf16_training_parity(rng):
    """bf16 compute must track f32 convergence, not merely stay finite —
    this is the numerics-parity evidence behind bench.py's bf16
    production configuration (PERF.md 'Knob results')."""
    import jax.numpy as jnp
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.training import (
        create_train_state,
        make_train_step,
    )

    # structured (learnable) input: sinusoidal ridges + noise
    t = np.linspace(0, 1, 16)[None, :, None, None]
    x = jnp.asarray(
        (0.5 * np.sin(2 * np.pi * 4 * t)
         + 0.1 * rng.standard_normal((4, 16, 16, 1))).astype(np.float32)
    )
    cfg = Config()
    finals = {}
    for name, dtype in (("f32", jnp.float32), ("bf16", jnp.bfloat16)):
        model = VQVAE(input_dim=1, dim=16, z_dim=32, dtype=dtype)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        state = create_train_state(variables, cfg.train)
        step = make_train_step(model, cfg, donate=False)
        losses = []
        for i in range(120):
            state, m = step(state, {"x": x}, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert np.isfinite(losses).all()
        finals[name] = losses[-1]
        assert losses[-1] < 0.25 * losses[0]  # both must actually learn
    # bf16 final loss within 25% of f32 on the same trajectory
    # (measured: 0.91 vs 0.81 at step 120, identical through step 60)
    assert finals["bf16"] < 1.25 * finals["f32"], finals


def test_vqvae_groupnorm_variant(rng):
    """norm='group': no batch_stats collection, per-sample statistics,
    trains end-to-end (SURVEY §7 hard part 4 alternative)."""
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.training import create_train_state, make_train_step

    model = VQVAE(input_dim=1, dim=16, z_dim=32, norm="group")
    x = _mel_batch(rng, b=4, h=16, w=16)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" not in variables
    state = create_train_state(variables, Config().train)
    step = make_train_step(model, Config(), donate=False)
    losses = []
    for i in range(15):
        state, m = step(state, {"x": x}, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] and np.isfinite(losses[-1])
    # per-sample stats: single-example eval equals its batched eval
    y_batch, _, _ = model.apply(variables, x, train=False)
    y_single, _, _ = model.apply(variables, x[:1], train=False)
    np.testing.assert_allclose(
        np.asarray(y_batch[0]), np.asarray(y_single[0]), atol=1e-5
    )


def test_default_vae_mlp(rng):
    """DefaultVAE: the 784-400-20 MLP baseline (models.py:35-61)."""
    from neural_sound_generation_tpu.models import DefaultVAE

    model = DefaultVAE()
    x = jnp.asarray(rng.uniform(0, 1, (4, 28, 28, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    recon, mu, logvar = model.apply(
        variables, x, train=True, rngs={"sample": jax.random.PRNGKey(1)}
    )
    assert recon.shape == (4, 784)
    assert mu.shape == logvar.shape == (4, 20)
    assert float(recon.min()) >= 0 and float(recon.max()) <= 1  # sigmoid
    # eval path deterministic
    r1, _, _ = model.apply(variables, x, train=False)
    r2, _, _ = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_rvq_feature_conditioned_decode(rng):
    """decode_from_features must work with multi-stage codebooks too."""
    model = VQVAE(input_dim=1, dim=16, z_dim=32, cond_features=3,
                  num_quantizers=2)
    x = _mel_batch(rng, b=2, h=16, w=16)
    variables = model.init(
        jax.random.PRNGKey(0), x, train=False, features=jnp.zeros((2, 3))
    )
    out = model.apply(
        variables, jnp.asarray(rng.standard_normal((2, 3)).astype(np.float32)),
        (4, 4), train=False, method=VQVAE.decode_from_features,
    )
    assert out.shape == (2, 16, 16, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_pixelcnn_incremental_logits_match_parallel(pixelcnn_setup):
    """The fast sampler's row-cached arithmetic (vertical stack per row,
    horizontal stack per pixel) must reproduce the parallel forward
    exactly under teacher forcing."""
    from neural_sound_generation_tpu.models.pixelcnn import incremental_logits

    model, variables, x, label = pixelcnn_setup
    ref = np.asarray(model.apply(variables, x, label))
    inc = np.asarray(incremental_logits(model, variables, x, label))
    np.testing.assert_allclose(inc, ref, atol=1e-5)


def test_pixelcnn_fast_generate_matches_naive(pixelcnn_setup):
    """Same PRNG split order + same arithmetic (CPU) => identical samples
    from the O(HW)-forwards sampler and the incremental one (25x faster on
    TPU at batch 64 / 32x32)."""
    from neural_sound_generation_tpu.models.pixelcnn import fast_generate

    model, variables, _, _ = pixelcnn_setup
    label = jnp.asarray([0, 4], jnp.int32)
    key = jax.random.PRNGKey(11)
    a = np.asarray(
        generate(model, variables, label, key, shape=(8, 8), batch_size=2)
    )
    b = np.asarray(
        fast_generate(model, variables, label, key, shape=(8, 8), batch_size=2)
    )
    np.testing.assert_array_equal(a, b)


def test_pixelcnn_bf16_forward_and_fast_sampler(pixelcnn_setup):
    """dtype=bfloat16 (prior CLI --bf16): logits from the SAME f32
    params track the f32 model, the incremental path casts once at
    entry and still matches its own parallel forward, and fast_generate
    produces valid grids."""
    from neural_sound_generation_tpu.models.pixelcnn import (
        fast_generate, incremental_logits,
    )

    model32, variables, x, label = pixelcnn_setup
    model16 = GatedPixelCNN(input_dim=32, dim=16, n_layers=4, n_classes=5,
                            dtype=jnp.bfloat16)
    l32 = np.asarray(model32.apply(variables, x, label))
    l16 = np.asarray(model16.apply(variables, x, label))
    assert model16.apply(variables, x, label).dtype == jnp.float32
    np.testing.assert_allclose(l16, l32, atol=0.25)
    # incremental-vs-parallel parity holds WITHIN bf16 (same rounding)
    inc16 = np.asarray(incremental_logits(model16, variables, x, label))
    np.testing.assert_allclose(inc16, l16, atol=2e-2)
    out = np.asarray(
        fast_generate(model16, variables, label, jax.random.PRNGKey(3),
                      shape=(8, 8), batch_size=2)
    )
    assert out.shape == (2, 8, 8)
    assert (out >= 0).all() and (out < 32).all()


def test_pixelcnn_bf16_spatial_cond_incremental(rng):
    """bf16 + spatial_cond (the hier bottom prior under --bf16): the
    incremental path must cast cond_map with the params — an f32
    cond_map einsum-ed against the bf16-cast kernel promoted the cond
    path to f32 and crashed the next conv's same-dtype check."""
    from neural_sound_generation_tpu.models.pixelcnn import (
        fast_generate, incremental_logits,
    )

    model = GatedPixelCNN(input_dim=32, dim=16, n_layers=3, n_classes=5,
                          spatial_cond=True, dtype=jnp.bfloat16)
    x = jnp.asarray(rng.integers(0, 32, (2, 8, 8)), jnp.int32)
    label = jnp.asarray([1, 3], jnp.int32)
    cond = jnp.asarray(
        rng.standard_normal((2, 8, 8, 4)).astype(np.float32) * 0.2
    )
    variables = model.init(jax.random.PRNGKey(0), x, label, cond)
    ref = np.asarray(model.apply(variables, x, label, cond))
    inc = np.asarray(
        incremental_logits(model, variables, x, label, cond_map=cond)
    )
    np.testing.assert_allclose(inc, ref, atol=2e-2)
    out = np.asarray(
        fast_generate(model, variables, label, jax.random.PRNGKey(3),
                      shape=(8, 8), batch_size=2, cond_map=cond)
    )
    assert out.shape == (2, 8, 8)
    assert (out >= 0).all() and (out < 32).all()


def test_pixelcnn_fast_generate_nonsquare_and_conditioned(pixelcnn_setup):
    from neural_sound_generation_tpu.models.pixelcnn import fast_generate

    model, variables, _, _ = pixelcnn_setup
    label = jnp.asarray([1, 2, 3], jnp.int32)
    out = np.asarray(
        fast_generate(
            model, variables, label, jax.random.PRNGKey(5),
            shape=(6, 9), batch_size=3,
        )
    )
    assert out.shape == (3, 6, 9)
    assert out.min() >= 0 and out.max() < 32


def test_model_forwards_match_golden():
    """Frozen fixed-seed forward outputs (tests/golden/models_golden.npz):
    catches silent numeric drift from refactors of the model stacks —
    same role as the DSP/motion golden files."""
    import os

    import jax

    from neural_sound_generation_tpu.models import HierVQVAE

    path = os.path.join(os.path.dirname(__file__), "golden", "models_golden.npz")
    g = np.load(path)
    x = jnp.asarray(g["vqvae_in"])

    m = VQVAE(input_dim=1, dim=8, z_dim=16)
    v = m.init(jax.random.PRNGKey(7), x, train=False)
    xt, ze, zq = m.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(xt), g["vqvae_xt"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(ze), g["vqvae_ze"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(zq), g["vqvae_zq"], atol=1e-5)

    h = HierVQVAE(input_dim=1, dim=8, z_dim=16, z_dim_top=12)
    hv = h.init(jax.random.PRNGKey(8), x, train=False)
    hxt, (zet, _), (zeb, _) = h.apply(hv, x, train=False)
    np.testing.assert_allclose(np.asarray(hxt), g["hier_xt"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(zet), g["hier_zet"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(zeb), g["hier_zeb"], atol=1e-5)

    p = GatedPixelCNN(input_dim=16, dim=8, n_layers=3, n_classes=4)
    codes = jnp.asarray(g["pcnn_codes"])
    lab = jnp.asarray([1, 3], jnp.int32)
    pv = p.init(jax.random.PRNGKey(9), codes, lab)
    np.testing.assert_allclose(
        np.asarray(p.apply(pv, codes, lab)), g["pcnn_logits"], atol=1e-4
    )


@pytest.mark.parametrize(
    "maker,ci,shapes",
    [
        ("down", 3, [(2, 8, 8), (2, 7, 7), (2, 9, 6)]),
        ("up", 8, [(2, 4, 4), (2, 20, 7), (2, 5, 3)]),
    ],
)
def test_phased_conv_matches_stock(monkeypatch, maker, ci, shapes):
    """The phase-decomposed stride-2 convs (layers.py) are exact rewrites
    of the stock XLA lowering: same parameter tree, same outputs, same
    parameter/input gradients — on even AND odd spatial extents (the
    flagship's 20x7 latent grid exercises odd width). The rewrite exists
    so the TPU MXU never multiplies the zeros an LHS-dilated conv inserts;
    numerics must not change."""
    from neural_sound_generation_tpu.models import layers as L

    make = (lambda: L.conv_down(16)) if maker == "down" else (lambda: L.conv_up(16))
    for shape in shapes:
        x = jnp.asarray(
            np.random.default_rng(3).normal(size=shape + (ci,)).astype(np.float32)
        )
        monkeypatch.setenv("NSG_CONV_IMPL", "stock")
        mod_s = make()
        params = mod_s.init(jax.random.PRNGKey(0), x)

        def loss(mod, p, x):
            return jnp.sum(jnp.sin(mod.apply(p, x)))

        ys = mod_s.apply(params, x)
        gs, gxs = jax.grad(lambda p, x: loss(mod_s, p, x), argnums=(0, 1))(params, x)

        monkeypatch.setenv("NSG_CONV_IMPL", "phased")
        mod_p = make()
        yp = mod_p.apply(params, x)  # same param tree must be interchangeable
        gp, gxp = jax.grad(lambda p, x: loss(mod_p, p, x), argnums=(0, 1))(params, x)

        np.testing.assert_allclose(np.asarray(ys), np.asarray(yp), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gxs), np.asarray(gxp), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5
            )


def test_edge_conv_mode_matches_stock(monkeypatch):
    """NSG_CONV_IMPL=edge phase-decomposes ONLY the tiny-channel convs
    (the 1-channel spectrogram stem / audio head, where MXU lane padding
    dominates) and keeps the stock lowering for the wide convs. Numerics
    must equal stock exactly at the model level, and the gate must be
    selective."""
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.models import layers as L

    monkeypatch.setenv("NSG_CONV_IMPL", "edge")
    assert L._use_phased(1) and L._use_phased(8)
    assert not L._use_phased(256) and not L._use_phased(None)
    monkeypatch.setenv("NSG_CONV_IMPL", "stock")
    assert not L._use_phased(1)
    # edge is the production default (measured +1.7% flagship, PERF.md);
    # the 1-D call sites pass no edge_channels (measured -11% there)
    monkeypatch.delenv("NSG_CONV_IMPL", raising=False)
    assert L._use_phased(1) and not L._use_phased(None)
    # a typo must error, not silently measure stock (A/B integrity)
    monkeypatch.setenv("NSG_CONV_IMPL", "egde")
    with pytest.raises(ValueError, match="stock|phased|edge"):
        L._use_phased(1)
    monkeypatch.delenv("NSG_CONV_IMPL", raising=False)

    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(2, 16, 12, 1)).astype(np.float32)
    )
    model = VQVAE(input_dim=1, dim=16, z_dim=8)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    def loss(v):
        x_t, z_e, z_q = model.apply(v, x, train=False)
        return jnp.sum(jnp.sin(x_t)) + jnp.sum(z_e * z_q)

    # baseline must be STOCK explicitly — with edge as the env default,
    # an unset env here would compare edge against edge (vacuous)
    monkeypatch.setenv("NSG_CONV_IMPL", "stock")
    ys = model.apply(variables, x, train=False)[0]
    gs = jax.grad(loss)(variables)
    monkeypatch.setenv("NSG_CONV_IMPL", "edge")
    ye = model.apply(variables, x, train=False)[0]
    ge = jax.grad(loss)(variables)
    np.testing.assert_allclose(np.asarray(ys), np.asarray(ye), atol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(ge)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5
        )


@pytest.mark.parametrize(
    "k,s,lengths",
    [
        (4, 2, [16, 9, 1]),   # WaveVQVAE decoder upsampler
        (8, 4, [11, 1]),      # WaveNet ConditionUpsampler scale 4
        (6, 3, [5]),          # non-power-of-two scale
        (5, 2, [9]),          # s does not divide k (masked tap row)
        (2, 2, [6]),          # k == s
    ],
)
def test_phased_conv_transpose_1d_matches_stock(k, s, lengths):
    """The general (k, s) 1-D phased transpose conv (layers.ConvTranspose.
    _phased_1d) is an exact rewrite of flax's SAME lowering for every
    (kernel, stride) the models use — WaveVQVAE's 4/s2 decoder and the
    WaveNet conditioning upsampler's 2s/s stages — including odd lengths,
    T=1, and non-divisible k/s. Same parameter tree; outputs and both
    gradients match."""
    import flax.linen as nn

    from neural_sound_generation_tpu.models import layers as L

    ci, co = 5, 7
    stock = nn.ConvTranspose(co, (k,), strides=(s,), padding="SAME")
    phased = L.ConvTranspose(co, (k,), strides=(s,), padding="SAME")
    for t in lengths:
        x = jnp.asarray(
            np.random.default_rng(t).normal(size=(2, t, ci)).astype(np.float32)
        )
        params = stock.init(jax.random.PRNGKey(0), x)

        def loss(mod, p, x):
            return jnp.sum(jnp.sin(mod.apply(p, x)))

        ys = stock.apply(params, x)
        yp = phased.apply(params, x)  # same param tree must be interchangeable
        assert ys.shape == yp.shape == (2, s * t, co)
        gs, gxs = jax.grad(lambda p, x: loss(stock, p, x), argnums=(0, 1))(params, x)
        gp, gxp = jax.grad(lambda p, x: loss(phased, p, x), argnums=(0, 1))(params, x)
        np.testing.assert_allclose(np.asarray(ys), np.asarray(yp), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gxs), np.asarray(gxp), atol=1e-5)
        for a, b in zip(
            jax.tree_util.tree_leaves(gs), jax.tree_util.tree_leaves(gp)
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-5
            )


def test_wave_models_phased_matches_stock(monkeypatch):
    """Model-level check that the 1-D phased paths wired into WaveVQVAE
    (encoder strided convs + decoder transpose convs) and the WaveNet
    ConditionUpsampler change nothing numerically: one forward pass under
    NSG_CONV_IMPL=stock vs phased with identical params."""
    from neural_sound_generation_tpu.models.wavenet import ConditionUpsampler
    from neural_sound_generation_tpu.models.wavevqvae import WaveVQVAE

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 128, 1)).astype(np.float32)
    )
    monkeypatch.setenv("NSG_CONV_IMPL", "stock")
    m = WaveVQVAE(dim=16, z_dim=8, num_downsample=3)
    v = m.init(jax.random.PRNGKey(1), x, train=False)
    ys = m.apply(v, x, train=False)[0]
    monkeypatch.setenv("NSG_CONV_IMPL", "phased")
    yp = WaveVQVAE(dim=16, z_dim=8, num_downsample=3).apply(v, x, train=False)[0]
    np.testing.assert_allclose(np.asarray(ys), np.asarray(yp), atol=1e-5)

    c = jnp.asarray(
        np.random.default_rng(1).normal(size=(2, 7, 80)).astype(np.float32)
    )
    monkeypatch.setenv("NSG_CONV_IMPL", "stock")
    up = ConditionUpsampler(scales=(4, 4), channels=80)
    uv = up.init(jax.random.PRNGKey(2), c)
    us = up.apply(uv, c)
    monkeypatch.setenv("NSG_CONV_IMPL", "phased")
    upp = ConditionUpsampler(scales=(4, 4), channels=80).apply(uv, c)
    assert us.shape == upp.shape == (2, 7 * 16, 80)
    np.testing.assert_allclose(np.asarray(us), np.asarray(upp), atol=1e-5)


def test_phased_conv_bf16_matches_stock(monkeypatch):
    """The production path runs the phased convs in bf16 (flagship
    dtype); outputs must match the stock lowering at bf16 resolution —
    both lowerings sum the same 4 products per output on the MXU."""
    from neural_sound_generation_tpu.models import layers as L

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 20, 7, 8)).astype(np.float32)
    )
    for make in (lambda: L.conv_down(16, dtype=jnp.bfloat16),
                 lambda: L.conv_up(16, dtype=jnp.bfloat16)):
        monkeypatch.setenv("NSG_CONV_IMPL", "stock")
        mod_s = make()
        params = mod_s.init(jax.random.PRNGKey(0), x)
        ys = np.asarray(mod_s.apply(params, x), np.float32)
        monkeypatch.setenv("NSG_CONV_IMPL", "phased")
        yp = np.asarray(make().apply(params, x), np.float32)
        assert ys.shape == yp.shape
        scale = np.abs(ys).max() + 1e-6
        np.testing.assert_allclose(ys / scale, yp / scale, atol=2e-2)
