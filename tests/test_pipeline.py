"""Pipeline parallelism (parallel/pipeline.py) on the 8-device virtual
CPU mesh: the GPipe-staged block stack must match the unpipelined
forward bit-for-bit-ish (f32 tolerance), gradients must flow through the
ppermute ring, and a full pipeline-parallel train step must move the
loss. The reference has no pipeline engine at all (SURVEY §2a) — this
is framework-native capability, tested the way the DP/TP/SP axes are."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.models.transformer_prior import (
    TransformerPrior,
)
from neural_sound_generation_tpu.parallel.pipeline import (
    make_pp_mesh,
    pipeline_blocks,
    prior_pp_logits,
    stack_layer_params,
    unstack_layer_params,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _prior(n_layers=4, dim=32, k=16):
    model = TransformerPrior(
        input_dim=k, dim=dim, n_layers=n_layers, n_heads=2, n_classes=4,
        max_rows=8, max_cols=8,
    )
    codes = jnp.asarray(
        np.random.default_rng(1).integers(0, k, size=(8, 4, 6)), jnp.int32
    )
    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes, labels)
    return model, variables, codes, labels


def test_stack_unstack_roundtrip():
    model, variables, _, _ = _prior()
    params = variables["params"]
    stacked = stack_layer_params(params, model.n_layers)
    # every leaf gains the leading (n_layers,) axis
    for leaf in jax.tree_util.tree_leaves(stacked):
        assert leaf.shape[0] == model.n_layers
    back = unstack_layer_params(stacked, model.n_layers)
    for i in range(model.n_layers):
        a = jax.tree_util.tree_leaves(back[f"block_{i}"])
        b = jax.tree_util.tree_leaves(params[f"block_{i}"])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("n_pipe,n_micro", [(1, 1), (2, 4), (4, 2), (4, 8)])
def test_pipeline_blocks_matches_sequential(rng, n_pipe, n_micro):
    """The staged schedule (incl. bubble masking) equals folding the
    layers sequentially, for stage counts from degenerate S=1 up to
    S=4 and microbatch counts below/above S."""
    L, mb, t, d = 4, 2, 6, 8
    params = jnp.asarray(
        rng.standard_normal((L, d, d)).astype(np.float32) * 0.3
    )
    x = jnp.asarray(
        rng.standard_normal((n_micro, mb, t, d)).astype(np.float32)
    )

    def block_fn(p, a):
        return jnp.tanh(a @ p)

    mesh = make_pp_mesh(n_pipe)
    got = jax.jit(
        lambda p, xx: pipeline_blocks(block_fn, p, xx, mesh)
    )(params, x)

    want = x
    for i in range(L):
        want = jnp.tanh(want @ params[i])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_pipeline_blocks_grad_flows_over_ring(rng):
    """Gradients w.r.t. EVERY stage's weights must match the sequential
    program — the ppermute transpose carries them backwards across
    stages."""
    L, n_micro, mb, t, d = 4, 4, 2, 5, 8
    params = jnp.asarray(
        rng.standard_normal((L, d, d)).astype(np.float32) * 0.3
    )
    x = jnp.asarray(
        rng.standard_normal((n_micro, mb, t, d)).astype(np.float32)
    )

    def block_fn(p, a):
        return jnp.tanh(a @ p)

    mesh = make_pp_mesh(4)

    def loss_pp(p):
        return jnp.sum(pipeline_blocks(block_fn, p, x, mesh) ** 2)

    def loss_seq(p):
        a = x
        for i in range(L):
            a = jnp.tanh(a @ p[i])
        return jnp.sum(a**2)

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_seq = jax.jit(jax.grad(loss_seq))(params)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_seq),
                               atol=1e-4)
    # no stage's gradient is silently zero
    per_layer = np.abs(np.asarray(g_pp)).reshape(L, -1).max(axis=1)
    assert (per_layer > 0).all()


def test_prior_pp_logits_matches_model(rng):
    """TransformerPrior through the PP path == model.apply, pipe=4."""
    model, variables, codes, labels = _prior()
    mesh = make_pp_mesh(4)
    want = model.apply(variables, codes, labels)
    got = jax.jit(
        lambda v: prior_pp_logits(model, v, codes, labels, mesh, n_micro=4)
    )(variables)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def test_prior_pp_logits_dp_x_pp(rng):
    """DP x PP composition: ('data', 'pipe') = (2, 4) over 8 devices,
    microbatches sharded over 'data' inside the staged loop."""
    model, variables, codes, labels = _prior()
    mesh = make_pp_mesh(n_pipe=4, n_data=2)
    want = model.apply(variables, codes, labels)
    got = jax.jit(
        lambda v: prior_pp_logits(model, v, codes, labels, mesh, n_micro=2)
    )(variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)


def _moe_prior(n_layers=4, dim=32, k=16, n_experts=4):
    model = TransformerPrior(
        input_dim=k, dim=dim, n_layers=n_layers, n_heads=2, n_classes=4,
        n_experts=n_experts, max_rows=8, max_cols=8,
    )
    codes = jnp.asarray(
        np.random.default_rng(1).integers(0, k, size=(8, 4, 6)), jnp.int32
    )
    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), codes, labels)
    return model, variables, codes, labels


def _dense_moe_loss(model, params, codes, labels, aux_weight=0.01):
    """The trainer's routed-prior loss (trainer.py _pixelcnn_loss_fn):
    nll + aux_weight * mean-over-layers load balance."""
    logits, muts = model.apply(
        {"params": params}, codes, labels, mutable=["moe_losses"]
    )
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = jnp.mean(-jnp.take_along_axis(logp, codes[..., None], axis=-1))
    terms = jax.tree_util.tree_leaves(muts["moe_losses"])
    aux = sum(terms) / max(1, len(terms))
    return logits, nll, aux, nll + aux_weight * aux


@pytest.mark.parametrize("n_pipe,n_data,n_micro", [(4, 1, 4), (2, 2, 2)])
def test_prior_pp_moe_matches_dense(rng, n_pipe, n_data, n_micro):
    """Round-5: the routed prior under PP — logits AND the Switch
    load-balance aux collected across stages (per-row stats riding the
    ring) equal the dense trainer's, incl. under DP x PP. The round-4
    'does not collect the MoE load-balance loss' guard is gone."""
    model, variables, codes, labels = _moe_prior()
    mesh = make_pp_mesh(n_pipe=n_pipe, n_data=n_data)
    want_logits, _, want_aux, _ = _dense_moe_loss(
        model, variables["params"], codes, labels
    )
    got_logits, got_aux = jax.jit(
        lambda v: prior_pp_logits(
            model, v, codes, labels, mesh, n_micro=n_micro
        )
    )(variables)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=2e-4
    )
    np.testing.assert_allclose(
        float(got_aux), float(want_aux), atol=1e-5
    )


def test_prior_pp_moe_grads_match_dense(rng):
    """Full-loss gradients (nll + 0.01*aux) through the PP path equal
    the dense trainer's for every layer's router and expert weights —
    the aux's router gradient survives the ring."""
    model, variables, codes, labels = _moe_prior()
    mesh = make_pp_mesh(4)
    params = variables["params"]

    def loss_pp(p):
        logits, aux = prior_pp_logits(
            model, p, codes, labels, mesh, n_micro=4
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = jnp.mean(
            -jnp.take_along_axis(logp, codes[..., None], axis=-1)
        )
        return nll + 0.01 * aux

    def loss_dense(p):
        _, _, _, total = _dense_moe_loss(model, p, codes, labels)
        return total

    g_pp = jax.jit(jax.grad(loss_pp))(params)
    g_dense = jax.jit(jax.grad(loss_dense))(params)
    for i in range(model.n_layers):
        np.testing.assert_allclose(
            np.asarray(g_pp[f"block_{i}"]["moe"]["router"]["kernel"]),
            np.asarray(g_dense[f"block_{i}"]["moe"]["router"]["kernel"]),
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(g_pp[f"block_{i}"]["moe"]["w_in"]),
            np.asarray(g_dense[f"block_{i}"]["moe"]["w_in"]),
            atol=2e-5,
        )
    # router actually receives a load-balance gradient (non-zero)
    r = np.abs(np.asarray(g_pp["block_0"]["moe"]["router"]["kernel"]))
    assert r.max() > 0


def test_prior_pp_moe_train_step_learns(rng):
    """make_pp_prior_train_step on a routed prior: stage-sharded stacks
    (incl. expert weights) + moments, aux in metrics, loss drops."""
    import optax

    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_prior_train_step, pp_prior_partition,
    )

    model, variables, codes, labels = _moe_prior()
    mesh = make_pp_mesh(4)
    rest, stacked = pp_prior_partition(model, variables, mesh)
    assert "moe" in stacked and "pipe" in (
        stacked["moe"]["w_in"].sharding.spec
    )
    init_fn, step = make_pp_prior_train_step(
        model, mesh, 4, optax.adam(3e-3)
    )
    opt_state = init_fn(rest, stacked)
    batch = {"codes": codes, "labels": labels}
    losses, auxes = [], []
    for _ in range(25):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
        auxes.append(float(m["moe_load_balance"]))
    assert np.isfinite(losses).all() and np.isfinite(auxes).all()
    assert losses[-1] < 0.8 * losses[0], losses[::8]


def _spatial_prior(n_layers=4, dim=32, k=16, cc=8):
    """Hier-bottom shape: spatially conditioned prior + a cond map."""
    model = TransformerPrior(
        input_dim=k, dim=dim, n_layers=n_layers, n_heads=2, n_classes=4,
        spatial_cond=True, max_rows=8, max_cols=8,
    )
    r = np.random.default_rng(2)
    codes = jnp.asarray(r.integers(0, k, size=(8, 4, 6)), jnp.int32)
    labels = jnp.asarray(np.arange(8) % 4, jnp.int32)
    cond = jnp.asarray(
        r.standard_normal((8, 4, 6, cc)).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), codes, labels, cond)
    return model, variables, codes, labels, cond


def test_prior_pp_spatial_cond_matches_dense(rng):
    """Round-5: the hier-bottom prior's spatial conditioning under PP —
    cond_map is consumed by the replicated embed_sequence (cond_proj in
    `rest`), so the staged forward equals the dense model.apply and the
    cond-path gradients match. The round-4 guard in cli/prior.py is
    gone."""
    model, variables, codes, labels, cond = _spatial_prior()
    mesh = make_pp_mesh(4)
    want = model.apply(variables, codes, labels, cond)
    got = jax.jit(
        lambda v: prior_pp_logits(
            model, v, codes, labels, mesh, n_micro=4, cond_map=cond
        )
    )(variables)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)

    # the conditioning is live: a different map changes the logits
    got2 = jax.jit(
        lambda v: prior_pp_logits(
            model, v, codes, labels, mesh, n_micro=4, cond_map=cond * 2.0
        )
    )(variables)
    assert not np.allclose(np.asarray(got), np.asarray(got2))

    # cond_proj gradient parity (it sits in the replicated rest)
    def loss_pp(p):
        lo = prior_pp_logits(
            model, p, codes, labels, mesh, n_micro=4, cond_map=cond
        )
        return jnp.mean(lo**2)

    def loss_dense(p):
        return jnp.mean(model.apply({"params": p}, codes, labels, cond) ** 2)

    g_pp = jax.jit(jax.grad(loss_pp))(variables["params"])
    g_dense = jax.jit(jax.grad(loss_dense))(variables["params"])
    np.testing.assert_allclose(
        np.asarray(g_pp["cond_proj"]["kernel"]),
        np.asarray(g_dense["cond_proj"]["kernel"]),
        atol=2e-5,
    )


def test_prior_pp_spatial_cond_train_step_learns(rng):
    """make_pp_prior_train_step with batch['cond']: the conditioned
    staged step trains (PP x hier-bottom, composed)."""
    import optax

    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_prior_train_step, pp_prior_partition,
    )

    model, variables, codes, labels, cond = _spatial_prior()
    mesh = make_pp_mesh(4)
    rest, stacked = pp_prior_partition(model, variables, mesh)
    assert "cond_proj" in rest
    init_fn, step = make_pp_prior_train_step(
        model, mesh, 4, optax.adam(3e-3)
    )
    opt_state = init_fn(rest, stacked)
    batch = {"codes": codes, "labels": labels, "cond": cond}
    losses = []
    for _ in range(25):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.8 * losses[0], losses[::8]


def test_pp_partitioned_layout_is_memory_real(rng):
    """pp_prior_partition must leave each device holding only its L/S
    layers' weights (the point of PP), with embed/head replicated; the
    round trip back to the checkpoint layout is exact."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        pp_prior_partition, pp_prior_unpartition,
    )

    model, variables, codes, labels = _prior(n_layers=4)
    mesh = make_pp_mesh(4)
    rest, stacked = pp_prior_partition(model, variables, mesh)
    leaf = stacked["attn_qkv"]["kernel"]                  # (L, D, 3D)
    assert leaf.shape[0] == 4
    for shard in leaf.addressable_shards:
        assert shard.data.shape[0] == 1, shard.data.shape  # 1 layer/device... per pipe shard
    assert "pipe" in leaf.sharding.spec
    assert rest["head"]["kernel"].sharding.spec == ()

    back = pp_prior_unpartition(model, rest, stacked)
    for i in range(4):
        a = jax.tree_util.tree_leaves(back[f"block_{i}"])
        b = jax.tree_util.tree_leaves(
            variables["params"][f"block_{i}"]
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_pp_partitioned_train_step(rng):
    """make_pp_prior_train_step: loss drops, and the stacked params AND
    their Adam moments stay layer-sharded over 'pipe' across donated
    steps (per-stage optimizer state — no device ever materializes the
    full stack)."""
    import optax

    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_prior_train_step, pp_prior_partition,
    )

    model, variables, codes, labels = _prior(n_layers=4, dim=32)
    mesh = make_pp_mesh(4)
    rest, stacked = pp_prior_partition(model, variables, mesh)
    tx = optax.adam(3e-3)
    init_fn, step = make_pp_prior_train_step(model, mesh, 4, tx)
    opt_state = init_fn(rest, stacked)
    batch = {"codes": codes, "labels": labels}

    losses = []
    for _ in range(25):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], losses[::8]
    assert "pipe" in stacked["attn_qkv"]["kernel"].sharding.spec
    # the Adam moments for the stack carry the same layer sharding
    mu_stacked = opt_state[0].mu[1]
    assert "pipe" in mu_stacked["attn_qkv"]["kernel"].sharding.spec


def _wavenet(rng, layers=8, stacks=4):
    from neural_sound_generation_tpu.models.wavenet import WaveNet

    model = WaveNet(
        out_channels=30, layers=layers, stacks=stacks,
        residual_channels=8, gate_channels=8, skip_out_channels=8,
        kernel_size=3, cin_channels=4, gin_channels=-1,
        upsample_scales=(4, 4), scalar_input=True,
    )
    b, t = 4, 64
    x = jnp.asarray(rng.standard_normal((b, t, 1)).astype(np.float32) * 0.1)
    c = jnp.asarray(
        rng.standard_normal((b, t // 16, 4)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), x, c)
    return model, variables, x, c


def test_wavenet_pp_matches_model(rng):
    """The per-STACK staged WaveNet forward (static dilations inside
    each stage program, (h, skips, c_up) riding the ring) equals the
    plain teacher-forced forward."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        wavenet_pp_logits, wavenet_stack_params,
    )

    model, variables, x, c = _wavenet(rng)
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)
    # persistent layout: each device holds 1 of the 4 stacks
    leaf = stacked["dilated"]["kernel"]          # (stacks, per, K, R, G)
    assert leaf.shape[:2] == (4, 2)
    for shard in leaf.addressable_shards:
        assert shard.data.shape[0] == 1

    want = model.apply(variables, x, c)
    got = jax.jit(
        lambda r, s: wavenet_pp_logits(model, r, s, x, c, mesh, n_micro=2)
    )(rest, stacked)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_wavenet_pp_grads_flow(rng):
    """MoL-style scalar loss on the PP logits: every stack's dilated
    kernels receive the same gradient as the unpipelined program."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        wavenet_pp_logits, wavenet_stack_params,
    )

    model, variables, x, c = _wavenet(rng)
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)

    def loss_pp(s):
        return jnp.mean(
            wavenet_pp_logits(model, rest, s, x, c, mesh, n_micro=2) ** 2
        )

    g = jax.jit(jax.grad(loss_pp))(stacked)
    gk = np.asarray(g["dilated"]["kernel"])       # (4, 2, K, R, G)
    per_stack = np.abs(gk).reshape(4, -1).max(axis=1)
    assert (per_stack > 0).all(), per_stack

    # reference gradient through the plain model, mapped to the stacks
    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, x, c) ** 2)

    gref = jax.grad(loss_ref)(variables["params"])
    for i in range(model.layers):
        np.testing.assert_allclose(
            gk[i // 2, i % 2],
            np.asarray(gref[f"dilated_{i}"]["kernel"]),
            atol=1e-5,
        )


def _wavenet_speaker(rng, layers=8, stacks=4, n_speakers=3):
    """Speaker-conditioned vocoder (the multispeaker preset shape:
    gin_channels > 0, src/presets/multispeaker_cmu_arctic_mixture.json)."""
    from neural_sound_generation_tpu.models.wavenet import WaveNet

    model = WaveNet(
        out_channels=30, layers=layers, stacks=stacks,
        residual_channels=8, gate_channels=8, skip_out_channels=8,
        kernel_size=3, cin_channels=4, gin_channels=6,
        n_speakers=n_speakers, upsample_scales=(4, 4), scalar_input=True,
    )
    b, t = 4, 64
    x = jnp.asarray(rng.standard_normal((b, t, 1)).astype(np.float32) * 0.1)
    c = jnp.asarray(
        rng.standard_normal((b, t // 16, 4)).astype(np.float32) * 0.1
    )
    g = jnp.asarray(rng.integers(0, n_speakers, size=(b,)), jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), x, c, g)
    return model, variables, x, c, g


def test_wavenet_pp_speaker_matches_model(rng):
    """Round-5: speaker embeddings thread through the staged path — the
    gin-conditioned forward (g embedding on the broadcast, per-layer g
    convs staged with their stacks) equals the dense model.apply. This
    is what makes the multispeaker preset trainable under --mesh-pipe
    (the round-4 SystemExit guard is gone)."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        wavenet_pp_logits, wavenet_stack_params,
    )

    model, variables, x, c, g = _wavenet_speaker(rng)
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)
    assert "g" in stacked                  # per-layer g convs are staged
    assert "speaker_embed" in rest         # the table stays replicated

    want = model.apply(variables, x, c, g)
    got = jax.jit(
        lambda r, s: wavenet_pp_logits(
            model, r, s, x, c, mesh, n_micro=2, g=g
        )
    )(rest, stacked)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)

    # distinct speakers actually produce distinct logits (the embedding
    # is live, not silently dropped)
    got_other = jax.jit(
        lambda r, s: wavenet_pp_logits(
            model, r, s, x, c, mesh, n_micro=2, g=(g + 1) % 3
        )
    )(rest, stacked)
    assert not np.allclose(np.asarray(got), np.asarray(got_other))


def test_wavenet_pp_speaker_grads_match_dense(rng):
    """Speaker-path gradients under PP == dense: the staged g convs AND
    the replicated embedding table both receive the dense model's
    gradient (staged == dense for logits AND grads, per the round-4
    verdict's done-condition)."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        wavenet_pp_logits, wavenet_stack_params,
    )

    model, variables, x, c, g = _wavenet_speaker(rng)
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)

    def loss_pp(r, s):
        return jnp.mean(
            wavenet_pp_logits(model, r, s, x, c, mesh, n_micro=2, g=g) ** 2
        )

    gr, gs = jax.jit(jax.grad(loss_pp, argnums=(0, 1)))(rest, stacked)

    def loss_ref(p):
        return jnp.mean(model.apply({"params": p}, x, c, g) ** 2)

    gref = jax.grad(loss_ref)(variables["params"])
    per = model.layers // model.stacks
    for i in range(model.layers):
        np.testing.assert_allclose(
            np.asarray(gs["g"]["kernel"][i // per, i % per]),
            np.asarray(gref[f"g_{i}"]["kernel"]),
            atol=1e-5,
        )
    np.testing.assert_allclose(
        np.asarray(gr["speaker_embed"]["embedding"]),
        np.asarray(gref["speaker_embed"]["embedding"]),
        atol=1e-5,
    )


def test_wavenet_pp_speaker_train_step_learns(rng):
    """make_pp_wavenet_train_step with a speaker-conditioned model:
    the full optimizer step (stage-sharded stacks incl. g convs + Adam
    moments) runs and the MoL loss drops — PP x multispeaker training,
    the two round-4 marquee features composed."""
    import optax

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_wavenet_train_step, wavenet_stack_params,
    )

    model, variables, x, c, g = _wavenet_speaker(rng)
    cfg = Config()
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)
    init_fn, step = make_pp_wavenet_train_step(
        model, cfg, mesh, n_micro=2, tx=optax.adam(3e-3)
    )
    opt_state = init_fn(rest, stacked)
    batch = {"y": x, "c": c, "g": g}
    losses = []
    for _ in range(20):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.5, losses[::6]
    assert "pipe" in stacked["g"]["kernel"].sharding.spec


def test_wavenet_pp_speaker_bf16(rng):
    """bf16 staged math composes with the speaker path: logits close to
    f32 staging, embedding cast rides the broadcast ring at half width."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        wavenet_pp_logits, wavenet_stack_params,
    )

    model, variables, x, c, g = _wavenet_speaker(rng)
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)
    want = jax.jit(
        lambda r, s: wavenet_pp_logits(
            model, r, s, x, c, mesh, n_micro=2, g=g
        )
    )(rest, stacked)
    got = jax.jit(
        lambda r, s: wavenet_pp_logits(
            model, r, s, x, c, mesh, n_micro=2, g=g, dtype=jnp.bfloat16
        )
    )(rest, stacked)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05
    )


def test_wavenet_stack_unstack_roundtrip(rng):
    """wavenet_unstack_params inverts wavenet_stack_params exactly —
    the PP-trained vocoder exports the flat {name}_{i} layout the
    synthesize CLI restores."""
    from neural_sound_generation_tpu.parallel.pipeline import (
        wavenet_stack_params, wavenet_unstack_params,
    )

    model, variables, _, _ = _wavenet(rng)
    rest, stacked = wavenet_stack_params(model, variables)
    back = wavenet_unstack_params(model, rest, stacked)
    want = variables["params"]
    assert set(back.keys()) == set(want.keys())
    for k in want:
        for x, y in zip(
            jax.tree_util.tree_leaves(back[k]),
            jax.tree_util.tree_leaves(want[k]),
        ):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_wavenet_pp_train_step_learns(rng):
    """make_pp_wavenet_train_step — the round-4 optimizer counterpart to
    the fwd/grad-only wavenet_pp_logits: teacher-forced MoL loss on the
    last stage, stage-sharded stacks AND Adam moments, loss drops over
    donated steps."""
    import optax

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_wavenet_train_step, wavenet_stack_params,
    )

    model, variables, x, c = _wavenet(rng)
    cfg = Config()
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)
    init_fn, step = make_pp_wavenet_train_step(
        model, cfg, mesh, n_micro=2, tx=optax.adam(3e-3)
    )
    opt_state = init_fn(rest, stacked)
    # teacher forcing: y IS the target waveform; shift happens inside
    batch = {"y": x, "c": c}

    losses = []
    for _ in range(20):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.5, losses[::6]
    # stacks and their moments stay sharded over 'pipe' across steps
    assert "pipe" in stacked["dilated"]["kernel"].sharding.spec
    mu_stacked = opt_state[0].mu[1]
    assert "pipe" in mu_stacked["dilated"]["kernel"].sharding.spec
    for shard in stacked["dilated"]["kernel"].addressable_shards:
        assert shard.data.shape[0] == 1  # one stack per pipe shard


def test_wavenet_pp_train_step_categorical(rng):
    """The mulaw-quantize vocoder (softmax output, masked CE —
    src/hparams.py:18-21) trains pipeline-parallel too: int inputs
    embed on the replicated stem, the staged stacks differentiate, and
    the loss drops."""
    import optax

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models.wavenet import WaveNet
    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_wavenet_train_step, wavenet_stack_params,
    )

    model = WaveNet(
        out_channels=64, layers=4, stacks=2,
        residual_channels=8, gate_channels=8, skip_out_channels=8,
        kernel_size=3, cin_channels=4, gin_channels=-1,
        upsample_scales=(4, 4), scalar_input=False, quantize_channels=64,
    )
    b, t = 4, 64
    # learnable teacher-forced structure: y[t] = y[t-1] + 1 (mod K) —
    # the model sees y[t-1] as input, so CE can actually drop fast
    # (uniform random ints would only memorize)
    start = rng.integers(0, 64, size=(b, 1))
    y = jnp.asarray((start + np.arange(t)) % 64, jnp.int32)
    c = jnp.asarray(
        rng.standard_normal((b, t // 16, 4)).astype(np.float32) * 0.1
    )
    variables = model.init(
        jax.random.PRNGKey(0), WaveNet.shift_inputs(y, False), c
    )
    cfg = Config().parse_json({"input_type": "mulaw-quantize",
                               "quantize_channels": 64})
    mesh = make_pp_mesh(2)
    rest, stacked = wavenet_stack_params(model, variables, mesh)
    init_fn, step = make_pp_wavenet_train_step(
        model, cfg, mesh, n_micro=2, tx=optax.adam(1e-2)
    )
    opt_state = init_fn(rest, stacked)
    batch = {"y": y, "c": c}
    losses = []
    for _ in range(25):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.15, losses[::8]


def test_pp_opt_state_dense_roundtrip(rng):
    """pp_opt_state_to_dense/from_dense: Adam moments convert between
    the partitioned (rest, stacked) layout and the mesh-width-
    independent dense layout bit-exactly, and a pp4-trained state steps
    on under pp2 (the cross-layout checkpoint lifecycle)."""
    import optax

    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_prior_train_step,
        pp_opt_state_from_dense,
        pp_opt_state_to_dense,
        pp_prior_partition,
        pp_prior_split,
        pp_prior_unpartition,
    )

    model, variables, codes, labels = _prior(n_layers=4, dim=32)
    mesh4 = make_pp_mesh(4)
    rest, stacked = pp_prior_partition(model, variables, mesh4)
    tx = optax.adam(3e-3)
    init_fn, step4 = make_pp_prior_train_step(model, mesh4, 4, tx)
    opt_state = init_fn(rest, stacked)
    batch = {"codes": codes, "labels": labels}
    for _ in range(3):
        rest, stacked, opt_state, m4 = step4(rest, stacked, opt_state, batch)

    unpart = lambda r, s: pp_prior_unpartition(model, r, s)  # noqa: E731
    dense_p = unpart(rest, stacked)
    dense_o = pp_opt_state_to_dense(opt_state, unpart)
    # moments in dense layout mirror the params-tree structure
    assert "block_0" in dense_o[0].mu and "head" in dense_o[0].mu
    assert int(dense_o[0].count) == 3

    # round-trip back at the SAME width is exact
    mesh2 = make_pp_mesh(2)
    rest2, stacked2 = pp_prior_partition(model, {"params": dense_p}, mesh2)
    opt2 = pp_opt_state_from_dense(
        dense_o, lambda d: pp_prior_split(model, d), mesh2
    )
    np.testing.assert_array_equal(
        np.asarray(opt2[0].mu[1]["attn_qkv"]["kernel"]).reshape(-1),
        np.asarray(opt_state[0].mu[1]["attn_qkv"]["kernel"]).reshape(-1),
    )

    # ...and the pp2 step continues training from the pp4 trajectory
    _, step2 = make_pp_prior_train_step(model, mesh2, 4, tx)
    r, s, o = rest2, stacked2, opt2
    for _ in range(3):
        r, s, o, m2 = step2(r, s, o, batch)
    assert float(m2["loss"]) < float(m4["loss"])
    assert "pipe" in s["attn_qkv"]["kernel"].sharding.spec


def test_pp_opt_state_roundtrip_with_clip_chain(rng):
    """make_optimizer with clip_thresh/weight_decay wraps optax.adam in
    optax.chain, nesting the adam state one tuple deeper — the
    dense<->partitioned moment conversion must find it there (round-4
    advisor finding: any preset configuring clipping died on `assert
    found` at the first PP checkpoint save)."""
    import dataclasses

    from neural_sound_generation_tpu.cli.prior import build_pp_train
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.parallel.pipeline import (
        pp_opt_state_from_dense,
        pp_opt_state_to_dense,
        pp_prior_partition,
        pp_prior_split,
        pp_prior_unpartition,
    )

    model, variables, codes, labels = _prior(n_layers=4, dim=32)
    train_cfg = dataclasses.replace(
        Config().train, clip_thresh=1.0, weight_decay=1e-4
    )
    mesh4, _, init_fn, step4 = build_pp_train(
        model, n_pipe=4, n_data=1, n_micro=4, lr=3e-3, train_cfg=train_cfg
    )
    rest, stacked = pp_prior_partition(model, variables, mesh4)
    opt_state = init_fn(rest, stacked)
    batch = {"codes": codes, "labels": labels}
    for _ in range(2):
        rest, stacked, opt_state, m = step4(rest, stacked, opt_state, batch)
    assert np.isfinite(float(m["loss"]))

    unpart = lambda r, s: pp_prior_unpartition(model, r, s)  # noqa: E731
    dense_o = pp_opt_state_to_dense(opt_state, unpart)

    # the adam state is nested: find it and check the moments converted
    def find_adam(st):
        import optax

        if isinstance(st, optax.ScaleByAdamState):
            return st
        if isinstance(st, tuple) and not hasattr(st, "_fields"):
            for sub in st:
                got = find_adam(sub)
                if got is not None:
                    return got
        return None

    adam = find_adam(dense_o)
    assert adam is not None and int(adam.count) == 2
    assert "block_0" in adam.mu and "head" in adam.mu

    # re-partition at a different width and keep training
    mesh2, _, _, step2 = build_pp_train(
        model, n_pipe=2, n_data=1, n_micro=4, lr=3e-3, train_cfg=train_cfg
    )
    rest2, stacked2 = pp_prior_partition(
        model, {"params": unpart(rest, stacked)}, mesh2
    )
    opt2 = pp_opt_state_from_dense(
        dense_o, lambda d: pp_prior_split(model, d), mesh2
    )
    adam2 = find_adam(opt2)
    assert "pipe" in adam2.mu[1]["attn_qkv"]["kernel"].sharding.spec
    np.testing.assert_array_equal(
        np.asarray(adam2.mu[1]["attn_qkv"]["kernel"][0]),
        np.asarray(adam.mu["block_0"]["attn_qkv"]["kernel"]),
    )
    _, _, _, m2 = step2(rest2, stacked2, opt2, batch)
    assert np.isfinite(float(m2["loss"]))


def test_pp_train_step_learns(rng):
    """A full pipeline-parallel training step: masked-CE loss on the PP
    logits, grads through embed + staged blocks + head, plain Adam.
    The loss must drop — PP training end-to-end, stage weights sharded."""
    import optax

    model, variables, codes, labels = _prior(n_layers=4, dim=32)
    mesh = make_pp_mesh(4)
    params = variables["params"]
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def loss_fn(p):
        logits = prior_pp_logits(
            model, p, codes, labels, mesh, n_micro=4
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, codes[..., None], axis=-1)
        return jnp.mean(nll)

    step = jax.jit(
        lambda p, o: (lambda l, g: (l, *tx.update(g, o, p)))(
            *jax.value_and_grad(loss_fn)(p)
        )
    )

    losses = []
    for _ in range(30):
        loss, updates, opt = step(params, opt)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < 0.7 * losses[0], losses[::10]


def test_run_pp_training_interval_epochs(rng, tmp_path):
    """cli/_pp.run_pp_training: interval saves fire mid-epoch and store
    the last COMPLETED epoch (resume replays the interrupted epoch),
    end-of-epoch saves store the finished epoch, and the artifact stays
    the dense layout."""
    import orbax.checkpoint as ocp

    from neural_sound_generation_tpu.cli._pp import run_pp_training
    from neural_sound_generation_tpu.cli.prior import build_pp_train
    from neural_sound_generation_tpu.parallel import pipeline as pp

    model, variables, codes, labels = _prior(n_layers=2, dim=16)
    ckpt = str(tmp_path / "pp")

    epochs_seen = []

    def epoch_batches():
        for _ in range(3):
            yield {"codes": codes, "labels": labels}

    run_pp_training(
        ckpt_dir=ckpt, resume=False, epochs=2,
        n_pipe=2, n_data=1, n_micro=2,
        checkpoint_interval=2,
        set_epoch=epochs_seen.append,
        epoch_batches=epoch_batches,
        build=lambda p, d, m: build_pp_train(model, p, d, m, 1e-3),
        partition=lambda v, mesh: pp.pp_prior_partition(model, v, mesh),
        unpartition=lambda r, s: pp.pp_prior_unpartition(model, r, s),
        split_dense=lambda dense: pp.pp_prior_split(model, dense),
        variables=variables,
        kind="prior",
        epoch_line=lambda e, l: f"prior epoch {e}: {l:.3f}",
        ema_decay=0.5,
    )
    assert epochs_seen == [0, 1]  # shuffle order pinned per epoch

    import os as _os

    steps = sorted(
        int(d.split("_")[1]) for d in _os.listdir(ckpt)
        if d.startswith("step_")
    )
    # 3 batches/epoch x 2 epochs, interval 2: saves at 2 (mid-ep1),
    # 3 (end-ep1), 4 (mid-ep2), 6 (end-ep2)
    assert steps == [2, 3, 4, 6]
    with ocp.PyTreeCheckpointer() as c:
        extras = {
            s: int(c.restore(_os.path.join(ckpt, f"step_{s}"))["extra"]["epoch"])
            for s in steps
        }
    # mid-epoch saves store the last COMPLETED epoch
    assert extras == {2: 0, 3: 1, 4: 1, 6: 2}
    # artifact is the dense layout: block_i subtrees present
    with ocp.PyTreeCheckpointer() as c:
        art = c.restore(_os.path.join(ckpt, "step_6"))["state"]
    assert "block_0" in art["params"] and "block_1" in art["params"]

    # the EMA shadow exports the *_ema sibling in the same dense layout
    # and lags the live params (decay 0.5 after 6 steps != live)
    from neural_sound_generation_tpu.training import checkpoint as ckpt_mod

    assert ckpt_mod.latest_step(ckpt + "_ema") == 6
    with ocp.PyTreeCheckpointer() as c:
        ema_art = c.restore(
            _os.path.join(ckpt + "_ema", "step_6"))["state"]
    live = art["params"]["block_0"]["attn_qkv"]["kernel"]
    shadow = ema_art["params"]["block_0"]["attn_qkv"]["kernel"]
    assert not np.allclose(np.asarray(live), np.asarray(shadow))
    # the *_pp_train sibling carries the dense EMA for resume fidelity
    with ocp.PyTreeCheckpointer() as c:
        sib = c.restore(
            _os.path.join(ckpt + "_pp_train", "step_6"))["state"]
    assert "ema" in sib


def test_wavenet_pp_bf16_staging(rng):
    """dtype=bf16 staged math: logits close to the f32 staging at init
    (bf16 rounding tolerance), the train step runs with a bf16 ring
    payload, and the loss decreases — the PP counterpart of the dense
    --bf16 vocoder path."""
    import optax

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_wavenet_train_step, wavenet_pp_logits, wavenet_stack_params,
    )

    model, variables, x, c = _wavenet(rng)
    mesh = make_pp_mesh(4)
    rest, stacked = wavenet_stack_params(model, variables, mesh)

    want = jax.jit(
        lambda r, s: wavenet_pp_logits(model, r, s, x, c, mesh, n_micro=2)
    )(rest, stacked)
    got = jax.jit(
        lambda r, s: wavenet_pp_logits(
            model, r, s, x, c, mesh, n_micro=2, dtype=jnp.bfloat16
        )
    )(rest, stacked)
    assert got.dtype == want.dtype == jnp.float32  # loss head stays f32
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=0.05, rtol=0.05
    )

    cfg = Config()
    init_fn, step = make_pp_wavenet_train_step(
        model, cfg, mesh, n_micro=2, tx=optax.adam(3e-3), bf16=True
    )
    opt_state = init_fn(rest, stacked)
    batch = {"y": x, "c": c}
    losses = []
    for _ in range(15):
        rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.3, losses[::5]
    assert "pipe" in stacked["dilated"]["kernel"].sharding.spec
