"""TransformerPrior: the causal-attention peer of the GatedPixelCNN
prior (reference src/models.py:285-341's task, rebuilt MXU-first).

Covers: exact causality of the masked attention, KV-cached
incremental/teacher-forced parity, sampling determinism, the spatially
conditioned (hierarchical bottom) variant, the shared Trainer loss path,
and tensor-parallel sharding on the virtual mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import TransformerPrior
from neural_sound_generation_tpu.models.transformer_prior import (
    generate,
    incremental_logits,
)
from neural_sound_generation_tpu.parallel import (
    batch_sharding,
    make_mesh,
    model_param_shardings,
    replicated_sharding,
)
from neural_sound_generation_tpu.training import create_train_state, make_train_step


def _tiny(spatial_cond=False, k=16):
    return TransformerPrior(
        input_dim=k, dim=32, n_layers=2, n_heads=4, n_classes=3,
        spatial_cond=spatial_cond,
    )


def _codes(rng, b=2, h=4, w=5, k=16):
    return jnp.asarray(rng.integers(0, k, (b, h, w)), jnp.int32)


def test_forward_shape_and_dtype(rng):
    m = _tiny()
    codes = _codes(rng)
    lab = jnp.asarray([0, 2], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), codes, lab)
    logits = jax.jit(m.apply)(v, codes, lab)
    assert logits.shape == (2, 4, 5, 16)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_exact_causality(rng):
    """Perturbing the code at raster position j must leave logits at all
    positions <= j bit-identical (logits[t] conditions on codes[<t] only)
    and change at least one later position."""
    m = _tiny()
    codes = _codes(rng)
    lab = jnp.asarray([0, 2], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), codes, lab)
    f = jax.jit(m.apply)
    base = np.asarray(f(v, codes, lab)).reshape(2, 20, 16)
    for j in (0, 7, 18):
        c2 = np.asarray(codes).reshape(2, 20).copy()
        c2[:, j] = (c2[:, j] + 1) % 16
        out = np.asarray(
            f(v, jnp.asarray(c2.reshape(2, 4, 5)), lab)
        ).reshape(2, 20, 16)
        d = np.abs(base - out).max(axis=(0, 2))
        assert d[: j + 1].max() == 0.0, f"leak into position <= {j}"
        if j < 19:
            assert d[j + 1:].max() > 0.0


def test_class_conditioning_changes_logits(rng):
    m = _tiny()
    codes = _codes(rng, b=1)
    v = m.init(jax.random.PRNGKey(0), codes, jnp.zeros((1,), jnp.int32))
    f = jax.jit(m.apply)
    l0 = f(v, codes, jnp.asarray([0], jnp.int32))
    l1 = f(v, codes, jnp.asarray([1], jnp.int32))
    assert np.abs(np.asarray(l0) - np.asarray(l1)).max() > 0


def test_incremental_matches_teacher_forced(rng):
    m = _tiny()
    codes = _codes(rng)
    lab = jnp.asarray([1, 2], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), codes, lab)
    full = np.asarray(jax.jit(m.apply)(v, codes, lab))
    inc = np.asarray(incremental_logits(m, v["params"], codes, lab))
    np.testing.assert_allclose(inc, full, atol=2e-5)


def test_incremental_matches_teacher_forced_spatial_cond(rng):
    m = _tiny(spatial_cond=True)
    codes = _codes(rng)
    lab = jnp.asarray([1, 2], jnp.int32)
    cond = jnp.asarray(rng.standard_normal((2, 4, 5, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), codes, lab, cond)
    full = np.asarray(jax.jit(m.apply)(v, codes, lab, cond))
    inc = np.asarray(
        incremental_logits(m, v["params"], codes, lab, cond_map=cond)
    )
    np.testing.assert_allclose(inc, full, atol=2e-5)
    with pytest.raises(ValueError, match="cond_map"):
        jax.jit(m.apply)(v, codes, lab)


def test_generate_deterministic_and_in_range(rng):
    m = _tiny()
    codes = _codes(rng)
    lab = jnp.asarray([0, 1], jnp.int32)
    v = m.init(jax.random.PRNGKey(0), codes, lab)
    key = jax.random.PRNGKey(7)
    # accepts both the bare param tree and the {"params": ...} artifact
    g1 = np.asarray(generate(m, v["params"], lab, key, shape=(4, 5),
                             batch_size=2))
    g2 = np.asarray(generate(m, v, lab, key, shape=(4, 5), batch_size=2))
    assert g1.shape == (2, 4, 5) and g1.dtype == np.int32
    assert (g1 >= 0).all() and (g1 < 16).all()
    np.testing.assert_array_equal(g1, g2)
    g3 = np.asarray(generate(m, v, lab, jax.random.PRNGKey(8),
                             shape=(4, 5), batch_size=2))
    assert (g1 != g3).any()


def test_generate_spatial_cond_responds_to_map(rng):
    m = _tiny(spatial_cond=True)
    codes = _codes(rng)
    lab = jnp.asarray([0, 1], jnp.int32)
    cond_a = jnp.asarray(rng.standard_normal((2, 4, 5, 8)), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), codes, lab, cond_a)
    key = jax.random.PRNGKey(7)
    ga = np.asarray(generate(m, v, lab, key, shape=(4, 5), batch_size=2,
                             cond_map=cond_a))
    gb = np.asarray(generate(m, v, lab, key, shape=(4, 5), batch_size=2,
                             cond_map=cond_a * 10.0))
    assert ga.shape == (2, 4, 5)
    assert (ga != gb).any()


def test_bf16_forward_and_sampler(rng):
    """dtype=bfloat16 (the prior CLI's --bf16): teacher-forced logits
    track the f32 model from the SAME params, and the KV-cached sampler
    runs with bf16 caches (regression: f32-allocated caches crashed
    dynamic_update_slice under bf16 compute)."""
    from neural_sound_generation_tpu.models.transformer_prior import (
        generate,
    )

    kw = dict(input_dim=16, dim=32, n_layers=2, n_heads=2, n_classes=4,
              max_rows=8, max_cols=8)
    model32 = TransformerPrior(**kw)
    model16 = TransformerPrior(dtype=jnp.bfloat16, **kw)
    codes = jnp.asarray(rng.integers(0, 16, size=(4, 4, 6)), jnp.int32)
    labels = jnp.asarray(np.arange(4) % 4, jnp.int32)
    variables = model32.init(jax.random.PRNGKey(0), codes, labels)

    l32 = model32.apply(variables, codes, labels)
    l16 = model16.apply(variables, codes, labels)
    assert l16.dtype == jnp.float32  # head casts back
    np.testing.assert_allclose(
        np.asarray(l16), np.asarray(l32), atol=0.15
    )

    out = generate(model16, variables, labels, jax.random.PRNGKey(1),
                   shape=(4, 6), batch_size=4)
    out = np.asarray(out)
    assert out.shape == (4, 4, 6)
    assert (out >= 0).all() and (out < 16).all()


def test_trainer_loss_path_learns(rng):
    """make_train_step dispatches TransformerPrior through the shared
    prior NLL; a few steps on one repeated batch must cut the loss."""
    cfg = Config()
    m = _tiny()
    codes = _codes(rng, b=8)
    lab = jnp.asarray(rng.integers(0, 3, (8,)), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), codes, lab)
    state = create_train_state(v, cfg.train)
    step = make_train_step(m, cfg, donate=False)
    batch = {"codes": codes, "labels": lab}
    key = jax.random.PRNGKey(0)
    _, m0 = step(state, batch, key)
    for _ in range(30):
        state, metrics = step(state, batch, key)
    assert float(metrics["loss"]) < float(m0["loss"])
    assert float(metrics["loss"]) < np.log(16)  # beats the uniform prior


def test_tp_rules_shard_transformer_leaves(rng):
    mesh = make_mesh(n_data=4, n_model=2)
    m = _tiny()
    codes = _codes(rng)
    v = m.init(jax.random.PRNGKey(0), codes, jnp.zeros((2,), jnp.int32))
    sh = model_param_shardings(v["params"], mesh, tensor_parallel=True)
    # Megatron layout: qkv/mlp_in on output channels, the paired
    # out-projections on input channels
    assert sh["block_0"]["attn_qkv"]["kernel"].spec == P(None, "model")
    assert sh["block_0"]["mlp_in"]["kernel"].spec == P(None, "model")
    assert sh["block_0"]["attn_out"]["kernel"].spec == P("model", None)
    assert sh["block_0"]["mlp_out"]["kernel"].spec == P("model", None)
    assert sh["tok_embed"]["embedding"].spec == P(None, "model")
    assert sh["head"]["kernel"].spec == P(None, "model")
    # norms + biases stay replicated
    assert sh["block_0"]["ln1"]["scale"].spec == P()
    assert sh["bos"].spec == P()


def test_tp_step_matches_single_device(rng):
    """A dp4xtp2 TransformerPrior train step must produce the same loss
    as the unsharded step — GSPMD layout must not change the math."""
    cfg = Config()
    m = _tiny()
    codes = _codes(rng, b=8)
    lab = jnp.asarray(rng.integers(0, 3, (8,)), jnp.int32)
    v = m.init(jax.random.PRNGKey(0), codes, lab)
    state = create_train_state(v, cfg.train, fused=False)
    batch = {"codes": codes, "labels": lab}
    key = jax.random.PRNGKey(0)

    step1 = make_train_step(m, cfg, donate=False)
    _, m1 = step1(state, batch, key)

    mesh = make_mesh(n_data=4, n_model=2)
    sh = model_param_shardings(state.params, mesh, tensor_parallel=True)
    rep = replicated_sharding(mesh)
    stateN = state.replace(
        params=jax.device_put(state.params, sh),
        batch_stats=jax.device_put(state.batch_stats, rep),
        opt_state=jax.device_put(state.opt_state, rep),
        step=jax.device_put(state.step, rep),
    )
    stepN = make_train_step(m, cfg, donate=False)
    batchN = jax.device_put(batch, batch_sharding(mesh))
    with mesh:
        _, mN = stepN(stateN, batchN, jax.device_put(key, rep))
    np.testing.assert_allclose(float(m1["loss"]), float(mN["loss"]),
                               rtol=1e-5)


def test_prior_generate_dispatches(rng):
    """inference.prior_generate routes TransformerPrior to the KV-cached
    sampler and PixelCNN to the row-cached one."""
    from neural_sound_generation_tpu.inference import prior_generate
    from neural_sound_generation_tpu.models import GatedPixelCNN

    lab = jnp.asarray([0, 1], jnp.int32)
    key = jax.random.PRNGKey(3)

    mt = _tiny()
    vt = mt.init(jax.random.PRNGKey(0), _codes(rng), lab)
    gt = prior_generate(mt, vt, lab, key, shape=(4, 5), batch_size=2)
    ref = generate(mt, vt, lab, key, shape=(4, 5), batch_size=2)
    np.testing.assert_array_equal(np.asarray(gt), np.asarray(ref))

    mp = GatedPixelCNN(input_dim=16, dim=8, n_layers=2, n_classes=3)
    vp = mp.init(jax.random.PRNGKey(0), _codes(rng),
                 jnp.zeros((2,), jnp.int32))
    gp = prior_generate(mp, vp, lab, key, shape=(4, 5), batch_size=2)
    assert np.asarray(gp).shape == (2, 4, 5)


def test_checkpoint_roundtrip(tmp_path, rng):
    """The prior CLI's artifact layout ({"params": ...}) restores into a
    template init and samples identically."""
    from neural_sound_generation_tpu.training import checkpoint

    m = _tiny()
    codes = _codes(rng)
    lab = jnp.asarray([0, 1], jnp.int32)
    v = m.init(jax.random.PRNGKey(1), codes, lab)
    checkpoint.save(str(tmp_path / "ck"), {"params": v["params"]}, step=1)
    template = m.init(jax.random.PRNGKey(0), codes, lab)
    restored, _ = checkpoint.restore(str(tmp_path / "ck"), template)
    key = jax.random.PRNGKey(5)
    a = generate(m, v, lab, key, shape=(4, 5), batch_size=2)
    b = generate(m, restored, lab, key, shape=(4, 5), batch_size=2)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_oversized_grid_raises(rng):
    m = TransformerPrior(input_dim=8, dim=16, n_layers=1, n_heads=2,
                         n_classes=2, max_rows=4, max_cols=4)
    codes = jnp.zeros((1, 5, 4), jnp.int32)
    with pytest.raises(ValueError, match="positional tables"):
        m.init(jax.random.PRNGKey(0), codes, jnp.zeros((1,), jnp.int32))
