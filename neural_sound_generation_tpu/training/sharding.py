"""TrainState placement on a device mesh: dp replication + tp shardings.

The reference has no tensor parallelism anywhere (SURVEY.md §2a); this is
a framework capability. A ``TrainState`` is placed on the mesh with the
parameter tree sharded by ``parallel.mesh.model_param_shardings`` (codebook
rows + conv output channels over the 'model' axis), optimizer moments
mirroring their parameters, and everything else replicated. The resulting
sharding tree is also what ``make_train_step`` uses as explicit jit
in/out shardings, so the compiled step keeps parameters resident in their
tensor-parallel layout instead of re-gathering them every step.

Used by the production ``Trainer`` (cli/main.py --mesh-model N), the
prior/vocoder CLIs, and ``__graft_entry__.dryrun_multichip`` — one code
path, not a test-only artifact.
"""

from __future__ import annotations

import jax
import optax
from jax.sharding import Mesh

from neural_sound_generation_tpu.parallel.mesh import (
    model_param_shardings,
    replicated_sharding,
)
from neural_sound_generation_tpu.training.train_state import (
    FusedOptState,
    TrainState,
)


def opt_state_shardings(opt_state, param_sh, rep):
    """Sharding tree for an optimizer state: Adam moments mirror the
    param shardings; flat fused moments and scalar counts replicate."""
    if isinstance(opt_state, FusedOptState):
        # flat vectors can't mirror a structured param sharding — the
        # fused optimizer is a replicated-params (pure dp) optimization;
        # create_train_state(fused=False) is required under tp
        return jax.tree_util.tree_map(lambda _: rep, opt_state)

    def map_state(entry):
        if isinstance(entry, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(count=rep, mu=param_sh, nu=param_sh)
        if isinstance(entry, tuple) and not hasattr(entry, "_fields"):
            # recurse: optax.chain nests states in plain tuples, and
            # optax.adam is itself a chain — under clip/weight-decay the
            # ScaleByAdamState sits one level down ((Empty, (Adam, Empty)));
            # stopping at the top level would silently replicate the
            # moments and defeat the tensor-parallel memory win
            return tuple(map_state(s) for s in entry)
        return jax.tree_util.tree_map(lambda _: rep, entry)

    return map_state(opt_state)


def train_state_shardings(
    state: TrainState, mesh: Mesh, tensor_parallel: bool = False
) -> TrainState:
    """A TrainState-shaped pytree of ``NamedSharding``s for ``state``.

    Usable directly as jit ``in_shardings``/``out_shardings`` (static
    fields ride along untouched) and as the target of ``jax.device_put``.
    With ``tensor_parallel`` off this is all-replicated (the pure-dp
    layout); with it on, params/moments/EMA shard over 'model'.
    """
    rep = replicated_sharding(mesh)
    param_sh = model_param_shardings(
        state.params, mesh, tensor_parallel=tensor_parallel
    )
    # structured EMA trees mirror the params; flat fused EMA replicates
    ema_structured = state.ema_params is not None and jax.tree_util.tree_structure(
        state.ema_params
    ) == jax.tree_util.tree_structure(state.params)
    return state.replace(
        step=rep,
        params=param_sh,
        batch_stats=jax.tree_util.tree_map(lambda _: rep, state.batch_stats),
        opt_state=opt_state_shardings(state.opt_state, param_sh, rep),
        ema_params=(
            None
            if state.ema_params is None
            else (
                param_sh
                if ema_structured
                else jax.tree_util.tree_map(lambda _: rep, state.ema_params)
            )
        ),
        codebook_ema=(
            None
            if state.codebook_ema is None
            else jax.tree_util.tree_map(lambda _: rep, state.codebook_ema)
        ),
    )


def shard_train_state(
    state: TrainState, mesh: Mesh, tensor_parallel: bool = False
) -> TrainState:
    """Place ``state`` on the mesh per ``train_state_shardings``."""
    sh = train_state_shardings(state, mesh, tensor_parallel)
    return jax.device_put(state, sh)
