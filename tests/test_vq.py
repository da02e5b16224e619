"""Vector-quantization op tests: forward nearest-code parity and exact
straight-through / scatter-add gradient semantics
(reference: src/vector_quantization.py)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.ops.vq import (
    codebook_ema_update,
    codebook_lookup,
    vq,
    vq_st,
)


def _data(rng, n=64, d=16, k=32):
    x = rng.standard_normal((n, d)).astype(np.float32)
    cb = rng.standard_normal((k, d)).astype(np.float32)
    return x, cb


def test_vq_nearest_indices_brute_force(rng):
    x, cb = _data(rng)
    idx = np.asarray(vq(jnp.asarray(x), jnp.asarray(cb)))
    dists = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(idx, dists.argmin(1))


def test_vq_multidim_shape(rng):
    x = rng.standard_normal((4, 5, 6, 16)).astype(np.float32)
    cb = rng.standard_normal((32, 16)).astype(np.float32)
    idx = vq(jnp.asarray(x), jnp.asarray(cb))
    assert idx.shape == (4, 5, 6)


def test_vq_st_codes_are_nearest(rng):
    x, cb = _data(rng)
    codes, indices = vq_st(jnp.asarray(x), jnp.asarray(cb))
    np.testing.assert_allclose(np.asarray(codes), cb[np.asarray(indices)], atol=0)


def test_vq_st_straight_through_grad(rng):
    """d(loss)/d(inputs) must equal the upstream grad evaluated at the
    codes — passed through unchanged (vector_quantization.py:50-52)."""
    x, cb = _data(rng)

    def loss(x_):
        codes, _ = vq_st(x_, jnp.asarray(cb))
        return jnp.sum(jnp.sin(codes) ** 2)

    g = jax.grad(loss)(jnp.asarray(x))
    codes, _ = vq_st(jnp.asarray(x), jnp.asarray(cb))
    expected = np.asarray(2 * jnp.sin(codes) * jnp.cos(codes))
    np.testing.assert_allclose(np.asarray(g), expected, atol=1e-6)


def test_vq_st_codebook_grad_is_index_add(rng):
    """d(loss)/d(codebook) must equal scatter-add of upstream grads by
    selected index (vector_quantization.py:53-61)."""
    x, cb = _data(rng)
    w = rng.standard_normal(x.shape).astype(np.float32)

    def loss(cb_):
        codes, _ = vq_st(jnp.asarray(x), cb_)
        return jnp.sum(codes * jnp.asarray(w))

    g = np.asarray(jax.grad(loss)(jnp.asarray(cb)))
    _, indices = vq_st(jnp.asarray(x), jnp.asarray(cb))
    expected = np.zeros_like(cb)
    np.testing.assert_array_equal(g.shape, cb.shape)
    for i, k in enumerate(np.asarray(indices)):
        expected[k] += w[i]
    np.testing.assert_allclose(g, expected, atol=1e-5)


def test_vq_st_grads_match_torch_autograd(rng):
    """Cross-check both grads against a torch graph with the same
    semantics: STE via x + (e[idx] - x).detach(), codebook grad via
    embedding gather autograd (== index_add)."""
    x, cb = _data(rng, n=32, d=8, k=16)
    w = rng.standard_normal(x.shape).astype(np.float32)

    xt = torch.tensor(x, requires_grad=True)
    cbt = torch.tensor(cb, requires_grad=True)
    # use the op's own indices so the comparison tests gradient wiring,
    # not float32 argmin tie-breaking
    _, idx_jax = vq_st(jnp.asarray(x), jnp.asarray(cb))
    idx = torch.tensor(np.asarray(idx_jax).astype(np.int64))
    codes_t = xt + (cbt[idx] - xt).detach() + (cbt[idx] - cbt[idx].detach())
    # NOTE: reference semantics: encoder grad = upstream; codebook grad =
    # scatter-add of upstream. codes_t above realizes both paths.
    loss_t = (codes_t * torch.tensor(w)).sum()
    loss_t.backward()

    def loss(x_, cb_):
        codes, _ = vq_st(x_, cb_)
        return jnp.sum(codes * jnp.asarray(w))

    gx, gcb = jax.grad(loss, argnums=(0, 1))(jnp.asarray(x), jnp.asarray(cb))
    np.testing.assert_allclose(np.asarray(gx), xt.grad.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gcb), cbt.grad.numpy(), atol=1e-5)


def test_vq_no_grad_to_codebook_through_vq(rng):
    x, cb = _data(rng)

    def loss(cb_):
        idx = vq(jnp.asarray(x), cb_)
        return jnp.sum(idx.astype(jnp.float32))

    g = jax.grad(loss)(jnp.asarray(cb))
    assert np.allclose(np.asarray(g), 0.0)


def test_codebook_lookup_grad(rng):
    cb = rng.standard_normal((16, 8)).astype(np.float32)
    idx = jnp.asarray([0, 3, 3, 5], jnp.int32)

    def loss(cb_):
        return jnp.sum(codebook_lookup(cb_, idx))

    g = np.asarray(jax.grad(loss)(jnp.asarray(cb)))
    expected = np.zeros((16, 8), np.float32)
    for k in [0, 3, 3, 5]:
        expected[k] += 1
    np.testing.assert_allclose(g, expected)


def test_codebook_grad_fallback_matches_onehot(rng, monkeypatch):
    """The large-codebook segment_sum fallback of _sum_rows_by_code must
    produce the same codebook gradient as the one-hot MXU path (forcing
    it via a tiny byte threshold)."""
    import importlib

    # NOT ``import ...ops.vq as m``: ops/__init__ re-exports the ``vq``
    # FUNCTION under the same name, and py3.12 resolves the alias via
    # getattr on the package — returning the function, not the module
    vq_module = importlib.import_module(
        "neural_sound_generation_tpu.ops.vq"
    )

    x, cb = _data(rng)
    w = rng.standard_normal(x.shape).astype(np.float32)

    def loss(cb_):
        codes, idx = vq_st(jnp.asarray(x), cb_)
        return jnp.sum(
            (codes + codebook_lookup(cb_, idx).reshape(codes.shape))
            * jnp.asarray(w)
        )

    g_onehot = np.asarray(jax.grad(loss)(jnp.asarray(cb)))
    monkeypatch.setattr(vq_module, "_ONEHOT_GRAD_MAX_BYTES", 0)
    g_fallback = np.asarray(jax.grad(loss)(jnp.asarray(cb)))
    np.testing.assert_allclose(g_onehot, g_fallback, atol=1e-5)


def test_ema_cluster_counts_exact_in_bf16_fallback(monkeypatch):
    """Regression: the segment_sum fallback must accumulate cluster
    counts in f32 even when activations are bf16 — bf16 represents
    integers exactly only up to 256, so a code selected by 1000 windows
    in a batch got a rounded count before the upcast (skewing the EMA
    statistics large-codebook configs rely on)."""
    import importlib

    vq_module = importlib.import_module(
        "neural_sound_generation_tpu.ops.vq"
    )
    monkeypatch.setattr(vq_module, "_ONEHOT_GRAD_MAX_BYTES", 0)

    n, dim, k = 1000, 4, 8
    inputs = jnp.ones((n, dim), jnp.bfloat16)
    idx = jnp.zeros((n,), jnp.int32)  # every window picks code 0
    _, new_cluster, new_embed = vq_module.codebook_ema_update(
        jnp.zeros((k, dim)), jnp.zeros((k,)), jnp.zeros((k, dim)),
        inputs, idx, decay=0.0,
    )
    assert float(new_cluster[0]) == float(n)
    np.testing.assert_allclose(np.asarray(new_embed[0]), np.full(dim, n))


def test_ema_update_moves_codebook_toward_assigned_inputs(rng):
    k, d = 8, 4
    cb = rng.standard_normal((k, d)).astype(np.float32)
    # all inputs near code 0's region
    x = np.tile(cb[0] + 0.01, (100, 1)).astype(np.float32)
    idx = np.asarray(vq(jnp.asarray(x), jnp.asarray(cb))).reshape(-1)
    cluster = jnp.zeros((k,))
    esum = jnp.zeros((k, d))
    new_cb, new_cluster, _ = codebook_ema_update(
        jnp.asarray(cb), cluster, esum, jnp.asarray(x), jnp.asarray(idx), decay=0.5
    )
    tgt = int(idx[0])
    assert float(new_cluster[tgt]) > 0
    # updated code moves toward the assigned input mean
    before = np.linalg.norm(cb[tgt] - x[0])
    after = np.linalg.norm(np.asarray(new_cb)[tgt] - x[0])
    assert after < before


def test_vq_st_jit_and_vmap(rng):
    x = rng.standard_normal((4, 10, 8)).astype(np.float32)
    cb = rng.standard_normal((16, 8)).astype(np.float32)
    codes, idx = jax.jit(vq_st)(jnp.asarray(x), jnp.asarray(cb))
    assert codes.shape == x.shape
    assert idx.shape == (4 * 10,)


def test_pallas_kernel_matches_xla_interpret(rng):
    """Fused Pallas kernel (interpreter mode on CPU) vs XLA expansion."""
    from neural_sound_generation_tpu.ops.pallas.vq_kernel import (
        nearest_codebook_indices,
        pallas_supported,
    )
    from neural_sound_generation_tpu.ops.vq import _nearest_indices_xla

    x = rng.standard_normal((700, 128)).astype(np.float32)  # non-tile-multiple N
    cb = rng.standard_normal((256, 128)).astype(np.float32)
    assert pallas_supported(700, 128, 256)
    got = np.asarray(
        nearest_codebook_indices(jnp.asarray(x), jnp.asarray(cb), interpret=True)
    )
    ref = np.asarray(_nearest_indices_xla(jnp.asarray(x), jnp.asarray(cb)))
    np.testing.assert_array_equal(got, ref)


def test_pallas_backend_switch(rng):
    import importlib

    # ops.vq the *module* (the `vq` function shadows it as an attribute)
    vq_mod = importlib.import_module("neural_sound_generation_tpu.ops.vq")

    x = rng.standard_normal((256, 128)).astype(np.float32)
    cb = rng.standard_normal((128, 128)).astype(np.float32)
    ref = np.asarray(vq_mod.vq(jnp.asarray(x), jnp.asarray(cb)))
    vq_mod.set_vq_backend("pallas")
    try:
        got = np.asarray(vq_mod.vq(jnp.asarray(x), jnp.asarray(cb)))
    finally:
        vq_mod.set_vq_backend("auto")
    np.testing.assert_array_equal(got, ref)


def test_pallas_supported_constraints():
    from neural_sound_generation_tpu.ops.pallas.vq_kernel import pallas_supported

    assert pallas_supported(1000, 256, 512)
    assert not pallas_supported(1000, 100, 512)  # D not lane-aligned
    assert not pallas_supported(1000, 256, 500)  # K not lane-aligned
    # quantize_channels-scale codebooks route to the K-tiled kernel
    assert pallas_supported(1000, 256, 65536)
    assert pallas_supported(1000, 128, 4096)


def test_pallas_tiled_kernel_matches_xla_interpret(rng):
    """K-tiled kernel (running argmin across codebook blocks) vs XLA, on a
    K that is neither VMEM-resident nor a TILE_K multiple (pad path)."""
    from neural_sound_generation_tpu.ops.pallas.vq_kernel import (
        _fits_single_pass,
        nearest_codebook_indices,
    )
    from neural_sound_generation_tpu.ops.vq import _nearest_indices_xla

    x = rng.standard_normal((1500, 128)).astype(np.float32)
    cb = rng.standard_normal((1536, 128)).astype(np.float32)
    assert not _fits_single_pass(128, 1536)  # really exercises the tiled path
    got = np.asarray(
        nearest_codebook_indices(jnp.asarray(x), jnp.asarray(cb), interpret=True)
    )
    ref = np.asarray(_nearest_indices_xla(jnp.asarray(x), jnp.asarray(cb)))
    np.testing.assert_array_equal(got, ref)


def test_pallas_tiled_kernel_tie_break(rng):
    """Duplicate codes across different K tiles: earliest index must win,
    matching jnp.argmin semantics."""
    from neural_sound_generation_tpu.ops.pallas.vq_kernel import (
        nearest_codebook_indices,
    )

    cb = rng.standard_normal((1536, 128)).astype(np.float32)
    cb[1200] = cb[7]  # same code in tile 0 and tile 1
    x = np.repeat(cb[7][None, :], 16, axis=0).astype(np.float32)
    got = np.asarray(
        nearest_codebook_indices(jnp.asarray(x), jnp.asarray(cb), interpret=True)
    )
    np.testing.assert_array_equal(got, np.full(16, 7, np.int32))


def test_residual_vq_reduces_error(rng):
    """Each RVQ stage must shrink the quantization residual."""
    from neural_sound_generation_tpu.ops.vq import residual_vq

    x = jnp.asarray(rng.standard_normal((256, 16)).astype(np.float32))
    cbs = jnp.asarray(rng.standard_normal((4, 64, 16)).astype(np.float32) * 0.5)
    errors = []
    for q in range(1, 5):
        _, qsum, idx = residual_vq(x, cbs[:q])
        errors.append(float(jnp.mean((qsum - x) ** 2)))
        assert idx.shape == (q, 256)
    assert errors[3] < errors[2] < errors[1] < errors[0]


def test_residual_vq_grad_wiring(rng):
    """Encoder gets the upstream grad once (STE); every stage codebook
    gets scatter-add grads."""
    from neural_sound_generation_tpu.ops.vq import residual_vq

    x = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))
    cbs = jnp.asarray(rng.standard_normal((3, 16, 8)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 8)).astype(np.float32))

    def loss_st(x_):
        st, _, _ = residual_vq(x_, cbs)
        return jnp.sum(st * w)

    gx = jax.grad(loss_st)(x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(w), atol=1e-6)

    def loss_cb(cbs_):
        _, qsum, _ = residual_vq(x, cbs_)
        return jnp.sum(qsum * w)

    gcb = np.asarray(jax.grad(loss_cb)(cbs))
    assert gcb.shape == (3, 16, 8)
    for q in range(3):
        assert np.abs(gcb[q]).sum() > 0  # every stage receives grads


def test_rvq_vqvae_model(rng):
    from neural_sound_generation_tpu.models import VQVAE

    model = VQVAE(input_dim=1, dim=16, z_dim=32, num_quantizers=3)
    x = jnp.asarray(rng.standard_normal((2, 16, 16, 1)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    assert variables["params"]["codebook"].shape == (3, 32, 16)
    (xt, z_e, z_q), _ = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert xt.shape == x.shape
    idx = model.apply(variables, x, train=False, method=VQVAE.encode)
    assert idx.shape == (3, 2, 4, 4)
    recon = model.apply(variables, idx, train=False, method=VQVAE.decode)
    assert recon.shape == x.shape


def test_rvq_vqvae_trains(rng):
    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import create_train_state, make_train_step

    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16, num_quantizers=2)
    x = jnp.asarray(rng.standard_normal((4, 16, 16, 1)).astype(np.float32) * 0.1)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    state = create_train_state(variables, cfg.train)
    step = make_train_step(model, cfg, donate=False)
    losses = []
    for i in range(20):
        state, m = step(state, {"x": x}, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] and np.isfinite(losses[-1])


def test_restart_dead_codes(rng):
    from neural_sound_generation_tpu.ops.vq import restart_dead_codes

    cb = jnp.asarray(rng.standard_normal((8, 4)).astype(np.float32))
    batch = jnp.asarray(rng.standard_normal((100, 4)).astype(np.float32) + 10.0)
    usage = jnp.asarray([0.0, 5.0, 0.2, 3.0, 0.0, 1.0, 2.0, 0.5])
    new_cb = restart_dead_codes(cb, usage, batch, jax.random.PRNGKey(0))
    new_np, old_np = np.asarray(new_cb), np.asarray(cb)
    dead = [0, 2, 4, 7]  # usage < 1.0
    alive = [1, 3, 5, 6]
    for k in alive:
        np.testing.assert_array_equal(new_np[k], old_np[k])
    for k in dead:
        assert not np.allclose(new_np[k], old_np[k])
        assert new_np[k].mean() > 5  # drawn from the shifted batch


def test_restart_dead_codes_resets_ema_stats():
    """Regression: a restarted code must also restart its EMA statistics
    (cluster=1, embed_sum=candidate) — otherwise the NEXT
    codebook_ema_update recomputes the row as new_embed_sum/cluster from
    the STALE sums and reverts the restart, so restart never cures
    collapse (the code is re-randomized every step)."""
    from neural_sound_generation_tpu.ops.vq import (
        codebook_ema_update,
        restart_dead_codes,
    )

    dim, k, decay = 2, 3, 0.9
    dead_value = np.array([10.0, 10.0], np.float32)
    batch = jnp.asarray(
        np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 0.1], [0.1, 1.0]], np.float32)
    )
    # stale stats that would rebuild the dead value: cluster 2, sum 2*dead
    cluster = jnp.asarray(np.array([4.0, 4.0, 2.0], np.float32))
    esum = jnp.asarray(
        np.stack([[4.0, 0.2], [0.2, 4.0], 2.0 * dead_value]).astype(np.float32)
    )
    cb = jnp.asarray(
        np.stack([[1.0, 0.05], [0.05, 1.0], dead_value]).astype(np.float32)
    )
    usage = jnp.asarray(np.array([4.0, 4.0, 0.0], np.float32))

    new_cb, new_cluster, new_esum = restart_dead_codes(
        cb, usage, batch, jax.random.PRNGKey(0), threshold=0.5,
        cluster=cluster, embed_sum=esum,
    )
    candidate = np.asarray(new_cb[2])
    assert float(new_cluster[2]) == 1.0
    np.testing.assert_allclose(np.asarray(new_esum[2]), candidate)
    # alive rows' stats untouched
    np.testing.assert_allclose(np.asarray(new_cluster[:2]), [4.0, 4.0])

    # next EMA update assigns NOTHING to the restarted code; it must stay
    # ~at the candidate instead of reverting toward the old dead value
    idx = vq(batch, new_cb[:2])  # nearest among alive codes only
    cb2, _, _ = codebook_ema_update(
        new_cb, new_cluster, new_esum, batch, idx, decay=decay
    )
    drift = np.linalg.norm(np.asarray(cb2[2]) - candidate)
    revert = np.linalg.norm(np.asarray(cb2[2]) - dead_value)
    assert drift < 0.2, f"restarted code drifted {drift}"
    assert revert > 5.0, "restarted code reverted toward the stale value"


def test_rvq_restart_candidates_are_stage_residuals():
    """Regression: per-stage dead-code restarts must draw candidates from
    the stage's OWN residual inputs — raw encoder outputs are at a
    different scale, so a stage-1 code restarted from them never wins an
    assignment and is re-randomized forever."""
    from neural_sound_generation_tpu.ops.vq import (
        residual_codebook_ema_update,
        residual_vq,
        restart_dead_codes,
    )

    rng_ = np.random.default_rng(0)
    n, dim, k = 32, 4, 8
    # every input sits 0.1-close to a stage-0 center at scale 100, so
    # stage 1 sees ~0.1-scale residuals
    cb0 = (rng_.standard_normal((k, dim)) * 100.0).astype(np.float32)
    flat = jnp.asarray(
        cb0[rng_.integers(0, k, n)]
        + (rng_.standard_normal((n, dim)) * 0.1).astype(np.float32)
    )
    cb1 = (rng_.standard_normal((k, dim)) * 0.1).astype(np.float32)
    cbs = jnp.asarray(np.stack([cb0, cb1]))
    _, _, indices = residual_vq(flat, cbs)
    _, cluster, esum, residuals = residual_codebook_ema_update(
        cbs, jnp.zeros((2, k)), jnp.zeros((2, k, dim)), flat, indices,
        decay=0.0, return_residuals=True,
    )
    assert residuals.shape == (2, n, dim)
    # stage-1 residual inputs are ~100x smaller than the raw outputs
    assert float(jnp.abs(residuals[1]).max()) < float(
        jnp.abs(flat).max()
    ) / 5
    new_cb1 = restart_dead_codes(
        cbs[1], jnp.zeros((k,)), residuals[1], jax.random.PRNGKey(1),
        threshold=0.5,
    )
    # every restarted row is residual-scale, not raw-output-scale
    assert float(jnp.abs(new_cb1).max()) < 60.0


def test_data_codebook_init_shapes_and_residual_stages(rng):
    """data_codebook_init: rows drawn from the data (not the origin
    ball); RVQ stages are seeded from successive residuals, so stage 1's
    rows are much smaller than stage 0's."""
    from neural_sound_generation_tpu.ops.vq import data_codebook_init

    z_e = jnp.asarray(
        rng.standard_normal((4, 50, 8)).astype(np.float32) * 2.0 + 5.0
    )
    cb = data_codebook_init(z_e, (16, 8), jax.random.PRNGKey(0))
    assert cb.shape == (16, 8)
    # rows live inside the data distribution (mean ~5), not at origin
    assert abs(float(jnp.mean(cb)) - 5.0) < 1.0

    rcb = data_codebook_init(z_e, (2, 16, 8), jax.random.PRNGKey(0))
    assert rcb.shape == (2, 16, 8)
    n0 = float(jnp.linalg.norm(rcb[0], axis=-1).mean())
    n1 = float(jnp.linalg.norm(rcb[1], axis=-1).mean())
    assert n1 < 0.6 * n0, (n0, n1)


def test_data_codebook_init_beats_uniform_initial_usage(rng):
    """The motivating property: on an encoder output distribution away
    from the origin, the data-seeded codebook starts with far more live
    codes than the reference's U(+-1/K) origin ball."""
    from neural_sound_generation_tpu.ops.vq import data_codebook_init, vq

    z_e = jnp.asarray(
        rng.standard_normal((2048, 16)).astype(np.float32) + 3.0
    )
    k = 64
    uniform = jnp.asarray(
        rng.uniform(-1.0 / k, 1.0 / k, (k, 16)).astype(np.float32)
    )
    seeded = data_codebook_init(z_e, (k, 16), jax.random.PRNGKey(1))
    used_uniform = len(np.unique(np.asarray(vq(z_e[None], uniform))))
    used_seeded = len(np.unique(np.asarray(vq(z_e[None], seeded))))
    assert used_seeded > 3 * used_uniform, (used_uniform, used_seeded)
    assert used_seeded > k // 2
