"""Hierarchical (two-level) VQ-VAE — beyond-parity model family tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import HierVQVAE
from neural_sound_generation_tpu.training import create_train_state
from neural_sound_generation_tpu.training.trainer import (
    make_eval_step,
    make_train_step,
)


@pytest.fixture(scope="module")
def setup(rng_module):
    model = HierVQVAE(input_dim=1, dim=8, z_dim=16, z_dim_top=12)
    x = jnp.asarray(
        rng_module.uniform(-1, 1, (2, 80, 16, 1)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


@pytest.fixture(scope="module")
def rng_module():
    return np.random.default_rng(0)


def test_forward_shapes(setup):
    model, variables, x = setup
    x_tilde, (z_e_t, z_q_t), (z_e_b, z_q_b) = model.apply(
        variables, x, train=False
    )
    assert x_tilde.shape == x.shape
    assert z_e_t.shape == (2, 10, 2, 8)   # stride 8
    assert z_e_b.shape == (2, 20, 4, 8)   # stride 4
    assert z_q_t.shape == z_e_t.shape and z_q_b.shape == z_e_b.shape


def test_encode_shapes_and_ranges(setup):
    model, variables, x = setup
    idx_t, idx_b = model.apply(
        variables, x, train=False, method=HierVQVAE.encode
    )
    assert idx_t.shape == (2, 10, 2) and idx_b.shape == (2, 20, 4)
    assert int(idx_t.max()) < 12 and int(idx_b.max()) < 16
    assert int(idx_t.min()) >= 0 and int(idx_b.min()) >= 0


def test_decode_matches_forward(setup):
    """decode(encode(x)) must reproduce the forward reconstruction: the
    straight-through codes ARE the quantized vectors."""
    model, variables, x = setup
    x_tilde, _, _ = model.apply(variables, x, train=False)
    idx_t, idx_b = model.apply(
        variables, x, train=False, method=HierVQVAE.encode
    )
    x_dec = model.apply(
        variables, idx_t, idx_b, train=False, method=HierVQVAE.decode
    )
    np.testing.assert_allclose(
        np.asarray(x_dec), np.asarray(x_tilde), atol=1e-5
    )


def test_grads_reach_both_codebooks(setup):
    model, variables, x = setup

    def loss(params):
        x_tilde, (z_e_t, z_q_t), (z_e_b, z_q_b) = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=False,
        )
        from neural_sound_generation_tpu.training.losses import hier_vqvae_loss

        total, _ = hier_vqvae_loss(
            x_tilde, x, ((z_e_t, z_q_t), (z_e_b, z_q_b))
        )
        return total

    grads = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(grads["codebook_top"]).max()) > 0
    assert float(jnp.abs(grads["codebook_bottom"]).max()) > 0


def test_train_step_integration(setup):
    model, variables, x = setup
    cfg = Config()
    state = create_train_state(variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    new_state, metrics = step(state, {"x": x}, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert {"loss_vq_top", "loss_vq_bottom", "loss_recons"} <= set(metrics)
    # both codebooks moved
    for name in ("codebook_top", "codebook_bottom"):
        assert not np.allclose(
            np.asarray(new_state.params[name]), np.asarray(state.params[name])
        )


def test_eval_step_reports_both_perplexities(setup):
    model, variables, x = setup
    cfg = Config()
    state = create_train_state(variables, cfg.train)
    eval_step = make_eval_step(model, cfg)
    x_tilde, metrics = eval_step(state, {"x": x})
    assert x_tilde.shape == x.shape
    assert float(metrics["perplexity"]) >= 1.0
    assert float(metrics["perplexity_top"]) >= 1.0


def test_ema_codebook_flag_gated_off():
    """--ema-codebook with hiervqvae must not break state creation (the
    hierarchical codebooks train by gradient)."""
    model = HierVQVAE(input_dim=1, dim=8, z_dim=16)
    x = jnp.zeros((1, 80, 16, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, Config().train, ema_codebook=True)
    assert state.codebook_ema is None


def test_tp_sharding_rules_cover_both_codebooks(setup):
    from jax.sharding import PartitionSpec as P

    from neural_sound_generation_tpu.parallel.mesh import (
        make_mesh,
        model_param_shardings,
    )

    model, variables, _ = setup
    mesh = make_mesh(n_data=2, n_model=4)
    shardings = model_param_shardings(
        variables["params"], mesh, tensor_parallel=True
    )
    for name in ("codebook_top", "codebook_bottom"):
        assert shardings[name].spec == P("model", None)


@pytest.mark.slow
def test_train_cli_hiervqvae(tmp_path):
    from neural_sound_generation_tpu.cli import main as train_cli
    from tests.test_cli import _make_ljspeech
    from neural_sound_generation_tpu.cli import preprocess as preprocess_cli

    in_dir = _make_ljspeech(tmp_path / "in", n=4)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "hiervqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16",
        "--max-batches-per-epoch", "2",
    ])
    ckpt = tmp_path / "models" / "hiervqvae" / "checkpoint_ljspeech_8_16"
    assert ckpt.exists()

    # evaluate CLI must accept the family and use stride-8 crops
    import json

    from neural_sound_generation_tpu.cli import evaluate as evaluate_cli

    evaluate_cli.main([
        "--model", "hiervqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir), "--ckpt-dir", str(ckpt),
        "--batch-size", "2", "--dim", "8", "--z-dim", "16",
    ])


# --------------------------- hierarchical prior ---------------------------


def test_spatial_conditional_pixelcnn_logits(rng_module):
    from neural_sound_generation_tpu.models import GatedPixelCNN

    model = GatedPixelCNN(
        input_dim=16, dim=8, n_layers=3, n_classes=1, spatial_cond=True
    )
    x = jnp.asarray(rng_module.integers(0, 16, (2, 6, 4)), jnp.int32)
    label = jnp.zeros((2,), jnp.int32)
    cond = jnp.asarray(
        rng_module.standard_normal((2, 6, 4, 8)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, label, cond)
    a = np.asarray(model.apply(variables, x, label, cond))
    assert a.shape == (2, 6, 4, 16)
    # conditioning map actually conditions
    b = np.asarray(model.apply(variables, x, label, cond + 1.0))
    assert not np.allclose(a, b)
    # causality holds WITH conditioning: future pixels still invisible
    x2 = x.at[:, 5, 3].set((x[:, 5, 3] + 3) % 16)
    c = np.asarray(model.apply(variables, x2, label, cond))
    np.testing.assert_allclose(c[:, 2, 2], a[:, 2, 2], atol=1e-6)


def test_fast_sampler_matches_naive_with_spatial_cond(rng_module):
    from neural_sound_generation_tpu.models import GatedPixelCNN
    from neural_sound_generation_tpu.models.pixelcnn import (
        fast_generate,
        generate,
        incremental_logits,
    )

    model = GatedPixelCNN(
        input_dim=16, dim=8, n_layers=3, n_classes=1, spatial_cond=True
    )
    x = jnp.asarray(rng_module.integers(0, 16, (2, 6, 4)), jnp.int32)
    label = jnp.zeros((2,), jnp.int32)
    cond = jnp.asarray(
        rng_module.standard_normal((2, 6, 4, 8)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), x, label, cond)
    ref = np.asarray(model.apply(variables, x, label, cond))
    inc = np.asarray(incremental_logits(model, variables, x, label, cond))
    np.testing.assert_allclose(inc, ref, atol=1e-5)
    key = jax.random.PRNGKey(3)
    a = np.asarray(generate(
        model, variables, label, key, shape=(6, 4), batch_size=2,
        cond_map=cond,
    ))
    b = np.asarray(fast_generate(
        model, variables, label, key, shape=(6, 4), batch_size=2,
        cond_map=cond,
    ))
    np.testing.assert_array_equal(a, b)


def test_sample_hier_audio_end_to_end(setup, rng_module):
    """Full VQ-VAE-2-style chain: top prior -> conditioned bottom prior
    -> two-level decode -> Griffin-Lim."""
    from neural_sound_generation_tpu.inference import (
        hier_cond_map,
        sample_hier_audio,
    )
    from neural_sound_generation_tpu.models import GatedPixelCNN

    vq_model, vq_vars, x = setup
    Ht, Wt = 10, 2
    top = GatedPixelCNN(input_dim=12, dim=8, n_layers=2, n_classes=1)
    tv = top.init(
        jax.random.PRNGKey(1), jnp.zeros((1, Ht, Wt), jnp.int32),
        jnp.zeros((1,), jnp.int32),
    )
    bottom = GatedPixelCNN(
        input_dim=16, dim=8, n_layers=2, n_classes=1, spatial_cond=True
    )
    bv = bottom.init(
        jax.random.PRNGKey(2), jnp.zeros((1, 2 * Ht, 2 * Wt), jnp.int32),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 2 * Ht, 2 * Wt, 8)),
    )
    labels = jnp.zeros((2,), jnp.int32)
    idx_t, idx_b, wavs = sample_hier_audio(
        vq_model, vq_vars, top, tv, bottom, bv, labels, (Ht, Wt),
        Config().audio, jax.random.PRNGKey(0),
    )
    assert idx_t.shape == (2, Ht, Wt)
    assert idx_b.shape == (2, 2 * Ht, 2 * Wt)
    assert int(idx_t.max()) < 12 and int(idx_b.max()) < 16
    assert wavs.shape[0] == 2 and np.isfinite(np.asarray(wavs)).all()
    cond = hier_cond_map(vq_vars, idx_t)
    assert cond.shape == (2, 2 * Ht, 2 * Wt, 8)


def test_hier_sample_cli_mixed_architectures(tmp_path, caplog):
    """Round-5: `cli.prior sample --hier` with a transformer TOP and a
    pixelcnn BOTTOM — the routine mixed chain (pixelcnn past the long-T
    cliff) — restores BOTH checkpoints into matching templates via the
    --bottom-* overrides. Before the fix, a single-arch template
    silently grafted fresh-init weights into the mismatched level
    (checkpoint._fill_missing warns loudly; we assert it never fires)."""
    import logging
    import os

    from neural_sound_generation_tpu.cli import main as train_cli
    from neural_sound_generation_tpu.cli import preprocess as preprocess_cli
    from neural_sound_generation_tpu.cli import prior as prior_cli
    from tests.test_cli import _make_ljspeech

    in_dir = _make_ljspeech(tmp_path / "in", n=4)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "hiervqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
    ])
    hier_ckpt = str(
        tmp_path / "models" / "hiervqvae" / "checkpoint_ljspeech_8_16"
    )
    common = [
        "--datadir", str(out_dir), "--vqvae-ckpt", hier_ckpt,
        "--dim", "8", "--z-dim", "16", "--batch-size", "2",
        "--epochs", "1", "--max-batches-per-epoch", "2",
    ]
    prior_cli.main([
        "train", "--ckpt-dir", str(tmp_path / "top"),
        "--hier", "--hier-level", "top",
        "--arch", "transformer", "--prior-dim", "16", "--prior-layers", "2",
    ] + common)
    prior_cli.main([
        "train", "--ckpt-dir", str(tmp_path / "bottom"),
        "--hier", "--hier-level", "bottom",
        "--arch", "pixelcnn", "--prior-dim", "8", "--prior-layers", "3",
    ] + common)

    sample_dir = tmp_path / "samples"
    with caplog.at_level(logging.WARNING, logger="nsg.checkpoint"):
        prior_cli.main([
            "sample", "--vqvae-ckpt", hier_ckpt,
            "--prior-ckpt", str(tmp_path / "top"),
            "--bottom-ckpt", str(tmp_path / "bottom"), "--hier",
            "--output-dir", str(sample_dir),
            "--dim", "8", "--z-dim", "16",
            "--arch", "transformer", "--prior-dim", "16",
            "--prior-layers", "2",
            "--bottom-arch", "pixelcnn", "--bottom-dim", "8",
            "--bottom-layers", "3",
            "--code-shape", "10", "2", "--num-samples", "1",
        ])
    # no fresh-init grafts: both levels' templates matched their artifacts
    fills = [r for r in caplog.records if "missing" in r.getMessage()]
    assert not fills, [r.getMessage() for r in fills]
    assert any(f.endswith(".wav") for f in os.listdir(sample_dir))


def test_hiervqvae_codebook_init_data_cli(tmp_path, capsys):
    """--codebook-init data on the hier family: both codebooks seed
    from encoder outputs (top first, bottom recomputed under the
    seeded top) through the production CLI."""
    from neural_sound_generation_tpu.cli import main as train_cli
    from neural_sound_generation_tpu.cli import preprocess as preprocess_cli
    from tests.test_cli import _make_ljspeech

    in_dir = _make_ljspeech(tmp_path / "in", n=4)
    out_dir = tmp_path / "out"
    preprocess_cli.main(["ljspeech", str(in_dir), str(out_dir)])
    train_cli.main([
        "--model", "hiervqvae", "--dataset", "ljspeech",
        "--datadir", str(out_dir),
        "--sampledir", str(tmp_path / "results"),
        "--ckpt-dir", str(tmp_path / "models"),
        "--batch-size", "2", "--epochs", "1",
        "--dim", "8", "--z-dim", "16", "--max-batches-per-epoch", "2",
        "--codebook-init", "data",
    ])
    out = capsys.readouterr().out
    assert "codebook_top seeded from encoder outputs" in out
    assert "codebook_bottom seeded from encoder outputs" in out
    assert (
        tmp_path / "models" / "hiervqvae" / "checkpoint_ljspeech_8_16"
    ).exists()
