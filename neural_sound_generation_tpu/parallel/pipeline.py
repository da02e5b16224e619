"""Pipeline parallelism: GPipe-style staged execution of a uniform
block stack over a 'pipe' mesh axis.

The reference has no pipeline engine (SURVEY §2a: its only parallelism
artifacts are a dead NCCL config and an unwired rank-sliced sampler).
This module is the TPU-native construction for the case its models
never reach but this framework's priors can: a layer stack too large
for one chip's HBM. The design follows the standard JAX/TPU recipe
(scaling-book pipelining chapter) rather than a torch-style stage
scheduler:

* Per-layer parameters are STACKED on a leading axis and sharded over
  the mesh's ``pipe`` axis — each device physically holds only its
  ``L/S`` layers' weights (the point of PP: weight memory scales down
  with stages).
* Inside ``shard_map``, microbatches flow through stages with a
  ``lax.scan`` over ``M + S - 1`` ticks; the activation hand-off
  between neighboring stages is a ``ppermute`` ring shift over ICI.
* The whole schedule is one traced program: jit-compatible,
  reverse-differentiable (``ppermute``'s transpose is the inverse
  permutation, so gradients flow stage-to-stage backwards over the
  same ring), and composable with the ``data`` axis for DP x PP.

The bubble cost is the textbook ``(S-1)/(M+S-1)`` idle fraction —
every stage computes every tick, with results masked outside the
valid window. Single-chip runs (this environment's reality) execute
S=1 with zero bubble, which is how the CPU-mesh tests pin parity
against the unpipelined forward.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = [
    "stack_layer_params",
    "unstack_layer_params",
    "pipeline_blocks",
    "prior_pp_logits",
    "pp_prior_split",
    "pp_prior_partition",
    "pp_prior_unpartition",
    "make_pp_prior_train_step",
    "wavenet_stack_params",
    "wavenet_unstack_params",
    "wavenet_pp_logits",
    "make_pp_wavenet_train_step",
    "pp_opt_state_to_dense",
    "pp_opt_state_from_dense",
    "make_pp_mesh",
]


def make_pp_mesh(n_pipe: int, n_data: int = 1, devices=None) -> Mesh:
    """Mesh with ('data', 'pipe') axes — DP x PP. The 'pipe' axis is
    innermost so neighboring stages sit on ICI-adjacent devices."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    need = n_data * n_pipe
    assert need <= len(devices), f"need {need} devices, have {len(devices)}"
    grid = np.asarray(devices[:need]).reshape(n_data, n_pipe)
    return Mesh(grid, ("data", "pipe"))


def stack_layer_params(params, n_layers: int, prefix: str = "block_"):
    """``{f"{prefix}{i}": tree_i}`` -> one tree with a leading
    (n_layers,) axis on every leaf. The per-layer trees must be
    structurally identical (uniform block stacks are the precondition
    for pipelining them)."""
    blocks = [params[f"{prefix}{i}"] for i in range(n_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_layer_params(stacked, n_layers: int, prefix: str = "block_"):
    """Inverse of :func:`stack_layer_params` — back to the checkpoint
    layout (``block_i`` subtrees), e.g. to save a PP-trained prior in
    the artifact format ``cli/prior.py sample`` restores."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x: x[i], stacked)
        for i in range(n_layers)
    }


def pipeline_blocks(
    block_fn: Callable[..., Any],
    stacked_params,
    x_micro,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = "data",
    broadcast=None,
    out_fn: Optional[Callable[[Any], Any]] = None,
):
    """Run ``x_micro`` through the full stacked layer stack, pipelined
    over ``mesh.shape[axis]`` stages.

    ``block_fn(layer_params, act[, bcast]) -> act`` applies ONE layer.
    ``act`` may be a single array or a PYTREE of arrays sharing the
    same leading (M, mb) axes — the whole tree rides the ppermute ring
    between stages. ``stacked_params``: leaves with leading dim L
    (L % n_stages == 0); stage s holds layers [s*L/S, (s+1)*L/S) —
    weights are sharded, not replicated. ``x_micro``: (M, mb, ...)
    microbatch leaves; the mb axis is additionally sharded over
    ``data_axis`` when the mesh has one (DP x PP).

    ``broadcast`` (optional): a tree of (M, mb, ...) leaves that every
    layer reads but no layer writes (e.g. WaveNet's upsampled mel
    conditioning). It does NOT ride the ring: each stage indexes its
    CURRENT microbatch ``t - stage`` locally and passes the slice as
    ``block_fn``'s third argument — saving one full tree of ICI
    traffic per tick.

    ``out_fn`` (optional): maps the final act tree to the leaves the
    caller actually wants (default: identity). Only the filtered tree
    is carried per tick and psum-broadcast at the end — e.g. WaveNet
    keeps only the skip sum, not (residual, skips).

    Returns ``out_fn(act)`` stacked back to (M, mb, ...), numerically
    identical to folding ``block_fn`` over all L layers per microbatch.
    """
    tmap = jax.tree_util.tree_map
    n_stages = mesh.shape[axis]
    leading = {leaf.shape[0] for leaf in jax.tree_util.tree_leaves(stacked_params)}
    assert len(leading) == 1, f"inconsistent stacked leading dims: {leading}"
    n_layers = leading.pop()
    assert n_layers % n_stages == 0, (
        f"{n_layers} layers do not stage evenly over {n_stages} pipe shards"
    )
    n_micro = jax.tree_util.tree_leaves(x_micro)[0].shape[0]
    if out_fn is None:
        out_fn = lambda act: act  # noqa: E731

    data_in_mesh = data_axis is not None and data_axis in mesh.shape
    x_spec = P(None, data_axis) if data_in_mesh else P(None)
    p_spec = P(axis)

    def staged(p_local, x, bcast):
        # p_local leaves: (n_layers/S, ...) — this stage's layer slab
        stage = lax.axis_index(axis)

        def local_stack(act, bc):
            def one(a, p):
                return (
                    block_fn(p, a) if bcast is None else block_fn(p, a, bc)
                ), None

            out, _ = lax.scan(one, act, p_local)
            return out

        ring = [(i, (i + 1) % n_stages) for i in range(n_stages)]

        def _index_micro(tree, idx):
            return tmap(
                lambda a: lax.dynamic_index_in_dim(
                    a, jnp.clip(idx, 0, n_micro - 1), 0, keepdims=False
                ),
                tree,
            )

        def tick(carry, t):
            buf, y = carry
            # stage 0 ingests microbatch t (clamped into range during
            # the drain ticks; the result of those is masked out below)
            inp = _index_micro(x, t)
            act = tmap(lambda i, b: jnp.where(stage == 0, i, b), inp, buf)
            # broadcast leaves: stage s is processing microbatch t-s —
            # read it locally instead of shipping it around the ring
            bc = (
                None if bcast is None else _index_micro(bcast, t - stage)
            )
            out = local_stack(act, bc)
            # the LAST stage completes microbatch t-(S-1) at tick t
            oidx = jnp.clip(t - (n_stages - 1), 0, n_micro - 1)
            kept = out_fn(out)
            y = tmap(
                lambda yy, oo: lax.dynamic_update_index_in_dim(
                    yy,
                    jnp.where(
                        t >= n_stages - 1,
                        oo,
                        lax.dynamic_index_in_dim(yy, oidx, 0, keepdims=False),
                    ),
                    oidx,
                    0,
                ),
                y,
                kept,
            )
            buf = (
                lax.ppermute(out, axis, ring) if n_stages > 1 else out
            )
            return (buf, y), None

        # the carries become pipe-varying after the first tick's
        # stage-dependent masking; the zero inits must enter the scan
        # already marked as such (jax >= 0.8 varying-manual-axes typing)
        def _pipe_varying(a):
            try:
                return lax.pcast(a, (axis,), to="varying")
            except (AttributeError, TypeError):  # pragma: no cover
                return lax.pvary(a, (axis,))

        buf0 = tmap(lambda a: _pipe_varying(jnp.zeros_like(a[0])), x)
        y0 = tmap(lambda a: _pipe_varying(jnp.zeros_like(a)), out_fn(x))
        (_, y), _ = lax.scan(
            tick, (buf0, y0), jnp.arange(n_micro + n_stages - 1)
        )
        # outputs live on the last stage; mask+psum replicates them over
        # the ring (one broadcast at the end, not per tick). Run it at
        # S=1 too: it is free there and discharges the pipe-varying
        # typing the carries acquired (out_specs promise replication)
        y = tmap(
            lambda a: jnp.where(stage == n_stages - 1, a, jnp.zeros_like(a)),
            y,
        )
        return lax.psum(y, axis)

    # a dummy scalar stands in when no broadcast tree is given (the
    # traced branch never reads it — `bcast is None` is resolved at
    # trace time from the OUTER broadcast binding)
    bcast_arg = broadcast if broadcast is not None else jnp.zeros(())
    bcast_spec = (
        tmap(lambda _: x_spec, broadcast)
        if broadcast is not None else P()
    )

    def staged_outer(p_local, x, bc):
        return staged(p_local, x, bc if broadcast is not None else None)

    return shard_map(
        staged_outer,
        mesh=mesh,
        in_specs=(tmap(lambda _: p_spec, stacked_params),
                  tmap(lambda _: x_spec, x_micro),
                  bcast_spec),
        out_specs=tmap(lambda _: x_spec, out_fn(x_micro)),
    )(stacked_params, x_micro, bcast_arg)


def prior_pp_logits(
    model,
    params,
    codes: jnp.ndarray,
    label: jnp.ndarray,
    mesh: Mesh,
    n_micro: int,
    cond_map: Optional[jnp.ndarray] = None,
    axis: str = "pipe",
):
    """TransformerPrior forward with the block stack pipeline-parallel.

    Same contract as ``model.apply(variables, codes, label[, cond_map])``
    — (B, H, W) int codes -> (B, H, W, K) f32 logits — but the
    ``block_i`` weights are staged over the mesh's ``pipe`` axis and
    microbatched GPipe-style (``n_micro`` must divide B). Embedding and
    head run replicated outside the staged loop (they are tiny); grads
    flow through the whole thing, so a standard ``value_and_grad`` train
    step on top is pipeline-parallel training.

    CONVENIENCE path: it takes the ordinary (replicated) params tree
    and restacks per call, so the caller still holds every layer —
    right for parity tests and drop-in use, NOT for a stack that
    exceeds one chip's HBM. For the memory-real layout (each device
    persistently holding only its L/S layers, per-stage optimizer
    state) use :func:`pp_prior_partition` +
    :func:`make_pp_prior_train_step`.

    Routed models (``n_experts > 0``) return ``(logits, aux)`` — the
    Switch load-balance loss collected ACROSS stages (per-row stats
    ride the microbatch ring; see :func:`_pp_logits_core`) — so PP
    training applies the same regularizer the dense trainer does.
    """
    if "params" in params:
        params = params["params"]
    rest = {k: v for k, v in params.items() if not k.startswith("block_")}
    stacked = stack_layer_params(params, model.n_layers)
    logits, aux = _pp_logits_core(
        model, rest, stacked, codes, label, mesh, n_micro, cond_map, axis
    )
    return (logits, aux) if aux is not None else logits


def _pp_logits_core(model, rest, stacked, codes, label, mesh, n_micro,
                    cond_map=None, axis="pipe"):
    """Shared forward for the convenience (`prior_pp_logits`) and
    partitioned (`make_pp_prior_train_step`) paths. ``rest`` holds the
    embed/head params (replicated; `embed_sequence`/`head_logits` touch
    only these — incl. the hier-bottom cond_proj, so spatial
    conditioning needs no staging), ``stacked`` the block stack with
    leading layer axis. Returns ``(logits, aux)``; ``aux`` is None for
    dense models, else the Switch load-balance loss.

    Routed collection: the dense aux is mean over layers of
    ``E * sum_e(frac_le * mean_p_le)`` with frac/mean_p means over
    (B, T) (models/moe.py __call__). Routing and capacity are per ROW,
    so each block application under PP sows per-row stats (mb, 2, E);
    they accumulate into a (mb, L, 2, E) buffer riding the ppermute
    ring (each stage writes its layers' rows at the layer counter, a
    third int leaf on the ring), and the caller re-means over the
    gathered (B, L, 2, E) — numerically identical to the unpipelined
    trainer's aux for any microbatch count and DP sharding."""
    from neural_sound_generation_tpu.models.transformer_prior import (
        TransformerPrior, _Block,
    )

    b, h, w = codes.shape
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro {n_micro}"
    mb = b // n_micro

    x = model.apply(
        {"params": rest}, codes, label, cond_map,
        method=TransformerPrior.embed_sequence,
    )                                                     # (B, T, D)
    xm = x.reshape(n_micro, mb, *x.shape[1:])

    routed = getattr(model, "n_experts", 0) > 0
    block = _Block(dim=model.dim, n_heads=model.n_heads,
                   mlp_ratio=model.mlp_ratio,
                   n_experts=model.n_experts,
                   capacity_factor=model.capacity_factor,
                   dtype=model.dtype)

    aux = None
    if routed:
        L, E = model.n_layers, model.n_experts
        stats0 = jnp.zeros((n_micro, mb, L, 2, E), jnp.float32)
        cnt0 = jnp.zeros((n_micro, mb), jnp.int32)

        def block_fn(p, a):
            hh, stats, cnt = a
            y, muts = block.apply(
                {"params": p}, hh, mutable=["moe_stats"]
            )
            rows = muts["moe_stats"]["moe"]["rows"][0]    # (mb, 2, E)
            stats = lax.dynamic_update_slice(
                stats, rows[:, None], (0, cnt[0], 0, 0)
            )
            return (y, stats, cnt + 1)

        ym, stats, _ = pipeline_blocks(
            block_fn, stacked, (xm, stats0, cnt0), mesh, axis=axis
        )
        stats = stats.reshape(b, L, 2, E)
        frac = jnp.mean(stats[:, :, 0], axis=0)           # (L, E)
        mean_p = jnp.mean(stats[:, :, 1], axis=0)         # (L, E)
        aux = jnp.mean(E * jnp.sum(frac * mean_p, axis=-1))
    else:

        def block_fn(p, a):
            return block.apply({"params": p}, a)

        ym = pipeline_blocks(block_fn, stacked, xm, mesh, axis=axis)

    y = ym.reshape(b, *x.shape[1:])
    logits = model.apply(
        {"params": rest}, y, method=TransformerPrior.head_logits
    )
    return logits.reshape(b, h, w, model.input_dim), aux


def pp_prior_split(model, params):
    """Structural split (no placement): a dense TransformerPrior params
    dict ``{..., block_i: ...}`` -> ``(rest, stacked)``. Used directly
    by :func:`pp_opt_state_from_dense` and by the partitioner below."""
    if "params" in params:
        params = params["params"]
    rest = {k: v for k, v in params.items() if not k.startswith("block_")}
    stacked = stack_layer_params(params, model.n_layers)
    return rest, stacked


def pp_prior_partition(model, params, mesh: Mesh, axis: str = "pipe"):
    """Partition a TransformerPrior params tree into the PERSISTENT
    pipeline layout: ``(rest, stacked)`` where ``rest`` (embeddings,
    final LN, head) is replicated and ``stacked`` (the block stack,
    leading layer axis) is PLACED with its layer axis sharded over
    ``axis`` — after this call each device physically holds only its
    ``n_layers/S`` layers' weights. This is what realizes PP's memory
    claim; `prior_pp_logits` alone keeps the full tree replicated and
    restacks per call (fine for parity tests, not for a model that
    exceeds one chip's HBM)."""
    rest, stacked = pp_prior_split(model, params)
    return _place_pair(rest, stacked, mesh, axis)


def pp_prior_unpartition(model, rest, stacked):
    """Back to the checkpoint layout ``{..., block_i: ...}`` (gathers
    the stacked shards; use for artifact export, not in the hot loop)."""
    params = dict(rest)
    params.update(
        unstack_layer_params(jax.device_get(stacked), model.n_layers)
    )
    return params


def _place_pair(rest, stacked, mesh: Mesh, axis: str = "pipe"):
    """Place a (rest, stacked) pair in the persistent PP layout: rest
    replicated, stacked with its leading layer/stack axis sharded over
    ``axis`` (each device holds only its slab)."""
    from jax.sharding import NamedSharding

    staged = jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P(axis)), stacked
    )
    rep = NamedSharding(mesh, P())
    return (
        jax.device_put(rest, jax.tree_util.tree_map(lambda _: rep, rest)),
        jax.device_put(stacked, staged),
    )


def _map_adam_moments(opt_state, fn):
    """Apply ``fn`` to the moment pytrees (mu, nu) of the
    ``ScaleByAdamState`` inside an optax chain's state tuple; every other
    transform state passes through unchanged. The moments of the PP train
    steps are (rest, stacked) pairs — this is how they convert between
    the partitioned layout and the dense checkpoint layout.

    Recurses into nested tuples: ``make_optimizer`` wraps optax.adam
    inside ``optax.chain`` when clip_thresh/weight_decay are configured
    (train_state.py:306-312), nesting the adam state one tuple deeper —
    a preset with clipping must still checkpoint/restore under PP
    (mirrors checkpoint._find_adam_sd's any-position search)."""
    import optax

    def visit(st):
        if isinstance(st, optax.ScaleByAdamState):
            return (
                optax.ScaleByAdamState(
                    count=st.count, mu=fn(st.mu), nu=fn(st.nu)
                ),
                True,
            )
        if isinstance(st, tuple) and not hasattr(st, "_fields"):
            out, found = [], False
            for sub in st:
                new, hit = visit(sub)
                out.append(new)
                found = found or hit
            return tuple(out), found
        return st, False

    out, found = visit(tuple(opt_state))
    assert found, "expected a ScaleByAdamState in the optimizer chain"
    return out


def pp_opt_state_to_dense(opt_state, unpartition_fn):
    """Partitioned PP optimizer state -> dense checkpoint layout: each
    Adam moment (a (rest, stacked) pair) becomes ONE flat params-layout
    dict via ``unpartition_fn(rest, stacked)`` (e.g. a bound
    :func:`pp_prior_unpartition` / :func:`wavenet_unstack_params`).
    The dense layout is mesh-width-independent — a pp4 run's checkpoint
    restores under pp2 or dense (round-4 cross-layout lifecycle)."""
    return _map_adam_moments(
        opt_state, lambda pair: unpartition_fn(pair[0], pair[1])
    )


def pp_opt_state_from_dense(dense_opt, partition_fn, mesh: Mesh,
                            axis: str = "pipe"):
    """Inverse of :func:`pp_opt_state_to_dense`: re-partition each dense
    moment dict into the (rest, stacked) pair placed on ``mesh`` (stacked
    part sharded over ``axis``). ``partition_fn(dense_dict) -> (rest,
    stacked)`` performs the structural split (no placement). Non-moment
    leaves (Adam's ``count``, any schedule state) are re-placed
    replicated on the SAME mesh — the source state may live on a
    different device set entirely (cross-width restore)."""
    import optax

    from jax.sharding import NamedSharding

    rep = NamedSharding(mesh, P())

    def place(dense):
        rest, stacked = partition_fn(dense)
        return _place_pair(rest, stacked, mesh, axis)

    found = []

    def visit(st):
        if isinstance(st, optax.ScaleByAdamState):
            found.append(True)
            return optax.ScaleByAdamState(
                count=jax.device_put(st.count, rep),
                mu=place(st.mu),
                nu=place(st.nu),
            )
        if isinstance(st, tuple) and not hasattr(st, "_fields"):
            # recurse into optax.chain nesting (clip/weight-decay wrap
            # the adam state one tuple deeper) without clobbering the
            # placed moment shardings with a blanket replicated put
            return tuple(visit(s) for s in st)
        return jax.device_put(st, rep)

    out = visit(tuple(dense_opt))
    # fail fast at restore time: a dense state with no Adam moments
    # (fused layout, template drift) would otherwise surface later as
    # a confusing structural error inside the jitted step's tx.update
    assert found, "expected a ScaleByAdamState in the optimizer chain"
    return out


def wavenet_stack_params(model, params, mesh: Mesh = None,
                         axis: str = "pipe"):
    """Stack the WaveNet's per-layer params PER STACK: leading axes
    (n_stacks, layers_per_stack, ...). The dilation schedule repeats
    identically within every stack (2^0..2^(per-1), models/wavenet.py
    _dilations), so staging per stack keeps every dilation STATIC in
    the stage program — no traced conv dilations. With ``mesh``, the
    n_stacks axis is placed sharded over ``axis`` (the persistent PP
    layout). Returns (rest, stacked): rest = first_conv/upsampler/post
    (+embeddings), replicated."""
    if "params" in params:
        params = params["params"]
    L, S = model.layers, model.stacks
    assert L % S == 0, (
        f"layers={L} does not divide into stacks={S}; the trailing "
        f"layers would be silently dropped"
    )
    per = L // S
    groups = {"dilated": True, "res": True, "skip": True}
    if model.cin_channels > 0:
        groups["cond"] = True
    if model.gin_channels > 0:
        groups["g"] = True

    def stack_group(name):
        per_layer = [params[f"{name}_{i}"] for i in range(L)]
        # (S, per, ...) — inner stack over layers within a stack, outer
        # over stacks
        return jax.tree_util.tree_map(
            lambda *xs: jnp.stack(
                [jnp.stack(xs[s * per:(s + 1) * per]) for s in range(S)]
            ),
            *per_layer,
        )

    stacked = {name: stack_group(name) for name in groups}
    rest = {
        k: v for k, v in params.items()
        if not any(k.startswith(f"{n}_") and k[len(n) + 1:].isdigit()
                   for n in groups)
    }
    if mesh is not None:
        from jax.sharding import NamedSharding

        stacked = jax.device_put(
            stacked,
            jax.tree_util.tree_map(
                lambda _: NamedSharding(mesh, P(axis)), stacked
            ),
        )
        rep = NamedSharding(mesh, P())
        rest = jax.device_put(
            rest, jax.tree_util.tree_map(lambda _: rep, rest)
        )
    return rest, stacked


def wavenet_unstack_params(model, rest, stacked):
    """Inverse of :func:`wavenet_stack_params`: back to the flat
    ``{name}_{i}`` checkpoint layout the synthesize CLI / serve restore
    (gathers the stacked shards; artifact export, not the hot loop)."""
    L, S = model.layers, model.stacks
    per = L // S
    params = dict(jax.device_get(rest))
    stacked = jax.device_get(stacked)
    for name, tree in stacked.items():
        for i in range(L):
            s, j = divmod(i, per)
            params[f"{name}_{i}"] = jax.tree_util.tree_map(
                lambda x, s=s, j=j: x[s][j], tree
            )
    return params


def _wavenet_stage_fn(model, dtype=None, has_g: bool = False):
    """block_fn over ONE stack of WaveNet residual layers.

    ``p`` leaves: (per, ...) — this stack's layers; act = (h, skips),
    with the conditioning arriving as the stage-local broadcast slice.
    The layer math mirrors WaveNet.__call__ exactly
    (models/wavenet.py:170-184): z = dilated(h) + cond(c) [+ g(g_emb)];
    gated = tanh(a)*sigmoid(b); skips += skip(gated); h += res(gated).

    ``has_g``: the broadcast slice is ``(c_up, g_emb)`` — the speaker
    embedding (mb, gin) is time-constant, so its per-layer 1x1 conv
    collapses to one (gin, G) matmul broadcast over T (the reference's
    gin conditioning, src/hparams.py:80-84, staged).

    ``dtype=jnp.bfloat16`` runs the stage math in bf16 (params stay f32
    and cast per use — flax ``dtype=`` promotion semantics): full-rate
    MXU convs AND a halved ppermute/ring payload, mirroring the dense
    path's --bf16 (+41%% measured). The loss head stays f32 in the
    caller."""
    K = model.kernel_size
    per = model.layers // model.stacks
    cast = (lambda x: x.astype(dtype)) if dtype is not None else (lambda x: x)

    def causal_dilated(h, kern, bias, d):
        y = lax.conv_general_dilated(
            h, cast(kern), window_strides=(1,),
            padding=[((K - 1) * d, 0)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + cast(bias)

    def stage_fn(p, act, bc):
        h, skips = act
        if has_g:
            c_up, g_emb = bc
        else:
            c_up = bc
        for j in range(per):
            d = 2 ** j
            z = causal_dilated(
                h, p["dilated"]["kernel"][j], p["dilated"]["bias"][j], d
            )
            if "cond" in p:
                z = z + c_up @ cast(p["cond"]["kernel"][j][0])
            if has_g:
                z = z + (g_emb @ cast(p["g"]["kernel"][j][0]))[:, None, :]
            a, b = jnp.split(z, 2, axis=-1)
            gated = jnp.tanh(a) * jax.nn.sigmoid(b)
            skips = skips + (
                gated @ cast(p["skip"]["kernel"][j][0])
                + cast(p["skip"]["bias"][j])
            )
            h = h + gated @ cast(p["res"]["kernel"][j][0]) \
                + cast(p["res"]["bias"][j])
        return (h, skips)

    return stage_fn


def wavenet_pp_logits(
    model,
    rest,
    stacked,
    x: jnp.ndarray,
    c: jnp.ndarray,
    mesh: Mesh,
    n_micro: int,
    axis: str = "pipe",
    dtype=None,
    g: Optional[jnp.ndarray] = None,
):
    """WaveNet teacher-forced forward with the residual stacks
    pipeline-parallel: (B, T, 1) scalar inputs + (B, T', cin) mels
    [+ (B,) int speaker ids] -> (B, T, out_channels), numerically
    identical to ``model.apply(variables, x, c, g)``. Stage s holds
    stack s's layers (static dilations 1..2^(per-1) inside the stage
    program); the (residual, skip-sum) pair rides the microbatch ring
    while the upsampled conditioning — and, for gin_channels > 0, the
    speaker embedding — is stage-locally indexed (``broadcast``) and
    only the skip sum is carried out (``out_fn``). first_conv, the
    conditioning upsampler, the speaker embedding table, and the post
    head run replicated outside the staged loop; the per-layer g convs
    are staged with their stacks. This is what makes the multispeaker
    preset (src/presets/multispeaker_cmu_arctic_mixture.json,
    gin_channels=16) trainable under --mesh-pipe."""
    import flax.linen as nn

    from neural_sound_generation_tpu.models.wavenet import WaveNet

    assert model.dtype == jnp.float32, (
        "build the module f32; ``dtype=jnp.bfloat16`` selects bf16 "
        "STAGE math explicitly (params stay f32 — the dense --bf16 "
        "convention)"
    )
    assert model.cin_channels > 0 and c is not None, (
        "wavenet_pp_logits requires mel conditioning (cin_channels > 0 "
        "and c); unconditioned vocoders train on the DP/TP mesh"
    )
    b = x.shape[0]
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro {n_micro}"
    mb = b // n_micro

    h = model.apply({"params": rest}, x, method=WaveNet._embed)
    c_up = model.apply(
        {"params": rest}, c, method=lambda m, cc: m.upsampler(cc)
    )[:, : h.shape[1], :]
    g_emb = None
    if model.gin_channels > 0:
        assert g is not None, (
            "speaker-conditioned model (gin_channels > 0) needs g"
        )
        g_emb = model.apply(
            {"params": rest}, g, method=lambda m, gg: m.speaker_embed(gg)
        )                                                 # (B, gin)
    if dtype is not None:
        # bf16 activations enter the ring (halved ppermute payload);
        # the post head below runs f32 like the dense bf16 model's
        h = h.astype(dtype)
        c_up = c_up.astype(dtype)
        if g_emb is not None:
            g_emb = g_emb.astype(dtype)

    def mstack(a):
        return a.reshape(n_micro, mb, *a.shape[1:])

    skips0 = jnp.zeros(h.shape[:-1] + (model.skip_out_channels,), h.dtype)
    act = (mstack(h), mstack(skips0))
    stage_fn = _wavenet_stage_fn(model, dtype=dtype, has_g=g_emb is not None)
    # conditioning is read-only per stage -> `broadcast` keeps it off
    # the ppermute ring; only the skip sum is carried out (`out_fn`)
    bcast = (
        mstack(c_up) if g_emb is None
        else (mstack(c_up), mstack(g_emb))
    )
    skips = pipeline_blocks(
        stage_fn, stacked, act, mesh, axis=axis,
        broadcast=bcast, out_fn=lambda a: a[1],
    )
    skips = skips.reshape(b, *skips.shape[2:]).astype(jnp.float32)

    def post(m, s):
        return m.post2(nn.relu(m.post1(nn.relu(s))))

    return model.apply({"params": rest}, skips, method=post)


def make_pp_wavenet_train_step(model, cfg, mesh: Mesh, n_micro: int, tx,
                               axis: str = "pipe", bf16: bool = False):
    """Pipeline-parallel TRAINING step for the staged WaveNet vocoder —
    the optimizer counterpart to :func:`wavenet_pp_logits` (which is
    forward/grad only). Stage-sharded stacks AND Adam moments: each
    device updates only its stacks' layers, with the configured loss
    (teacher-forced MoL for scalar input, masked CE for mulaw-quantize —
    the reference's loss surface, src/hparams.py:18-21, 52-84) computed
    on the last stage's logits.

    ``tx`` is an optax transform whose state is built by the returned
    ``init_fn(rest, stacked)`` (moments inherit the stack sharding).
    ``step_fn(rest, stacked, opt_state, batch)`` is jitted with the
    partitioned args donated so weights update in place in their shards.
    Batch: ``{"y": targets (B, T, 1) f32 | (B, T) int, "c": (B, T',
    n_mels)[, "g": (B,) int speakers, "input_lengths": (B,)]}``."""
    from neural_sound_generation_tpu.models.wavenet import WaveNet
    from neural_sound_generation_tpu.training.losses import (
        discretized_mix_logistic_loss,
        masked_cross_entropy,
    )

    scalar = model.scalar_input

    def loss_fn(rest, stacked, batch):
        targets = batch["y"]
        x = WaveNet.shift_inputs(targets, scalar)
        y_hat = wavenet_pp_logits(
            model, rest, stacked, x, batch["c"], mesh, n_micro, axis=axis,
            dtype=jnp.bfloat16 if bf16 else None, g=batch.get("g"),
        )
        lengths = batch.get("input_lengths")
        if scalar:
            return discretized_mix_logistic_loss(
                y_hat, targets,
                num_classes=cfg.audio.quantize_channels,
                log_scale_min=cfg.arch.log_scale_min,
                lengths=lengths,
            )
        return masked_cross_entropy(y_hat, targets, lengths)

    def init_fn(rest, stacked):
        return tx.init((rest, stacked))

    def step(rest, stacked, opt_state, batch):
        import optax

        loss, grads = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            rest, stacked, batch
        )
        updates, opt_state = tx.update(grads, opt_state, (rest, stacked))
        rest, stacked = optax.apply_updates((rest, stacked), updates)
        return rest, stacked, opt_state, {"loss": loss}

    return init_fn, jax.jit(step, donate_argnums=(0, 1, 2))


def make_pp_prior_train_step(model, mesh: Mesh, n_micro: int, tx,
                             axis: str = "pipe"):
    """Pipeline-parallel training step over the partitioned layout.

    ``tx`` is an optax transform. Returns ``(init_fn, step_fn)``:
    ``init_fn(rest, stacked) -> opt_state`` (moments inherit the layer
    sharding — per-stage optimizer state, each device updates only its
    layers), ``step_fn(rest, stacked, opt_state, batch) -> (rest,
    stacked, opt_state, metrics)``, jitted with the partitioned args
    donated so weights update in place in their shards. Batch:
    ``{"codes": (B, H, W) int, "labels": (B,) int[, "cond": (B, H, W,
    Cc) — the hier-bottom prior's spatial conditioning, consumed by the
    replicated ``embed_sequence`` outside the staged loop]}``.

    Routed models (``n_experts > 0``) add the Switch load-balance aux
    (weight 0.01, the trainer's coefficient) collected across stages —
    ``metrics`` then carries ``moe_load_balance`` alongside the nll."""
    aux_weight = 0.01  # Switch-paper default, same as trainer.py
    routed = getattr(model, "n_experts", 0) > 0

    def loss_fn(rest, stacked, batch):
        logits, aux = _pp_logits_core(
            model, rest, stacked, batch["codes"], batch["labels"],
            mesh, n_micro, cond_map=batch.get("cond"), axis=axis,
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(
            logp, batch["codes"][..., None], axis=-1
        )
        nll = jnp.mean(nll)
        metrics = {"loss": nll}
        if routed:
            metrics["moe_load_balance"] = aux
            return nll + aux_weight * aux, metrics
        return nll, metrics

    def init_fn(rest, stacked):
        return tx.init((rest, stacked))

    def step(rest, stacked, opt_state, batch):
        (_, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(rest, stacked, batch)
        updates, opt_state = tx.update(grads, opt_state, (rest, stacked))
        import optax

        rest, stacked = optax.apply_updates((rest, stacked), updates)
        return rest, stacked, opt_state, metrics

    return init_fn, jax.jit(step, donate_argnums=(0, 1, 2))
