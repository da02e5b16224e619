"""Train state: params + batch stats + optimizer + parameter EMA.

The reference configures Adam (lr 1e-3, src/main.py:124) with an unused
"noam_learning_rate_decay" schedule name (src/hparams.py:106 — the
lrschedule module isn't in the repo) and EMA shadow parameters that are
never wired (clone_as_averaged_model calls an undefined build_model,
src/dataloader.py:262). Here both are real: a noam schedule option and a
per-step EMA pytree used for evaluation when enabled.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict
from jax.flatten_util import ravel_pytree

from neural_sound_generation_tpu.config import TrainConfig


def make_lr_schedule(cfg: TrainConfig):
    """lr schedule by name (hparams.py:106 ``lr_schedule``)."""
    name = cfg.lr_schedule
    kwargs = dict(cfg.lr_schedule_kwargs)
    base = cfg.initial_learning_rate
    if name in (None, "", "constant"):
        return optax.constant_schedule(base)
    if name == "noam_learning_rate_decay":
        warmup = float(kwargs.get("warmup_steps", 4000))

        def sched(step):
            step = jnp.maximum(step, 1).astype(jnp.float32)
            return base * warmup**0.5 * jnp.minimum(
                step * warmup**-1.5, step**-0.5
            )

        return sched
    if name == "step_learning_rate_decay":
        anneal_rate = float(kwargs.get("anneal_rate", 0.98))
        anneal_interval = int(kwargs.get("anneal_interval", 30000))
        return optax.exponential_decay(
            base, transition_steps=anneal_interval, decay_rate=anneal_rate,
            staircase=True,
        )
    raise ValueError(f"unknown lr_schedule: {name!r}")


class FusedOptState(flax.struct.PyTreeNode):
    """Adam moments held as single flat f32 vectors.

    The per-leaf optax update lowers to one VPU fusion per parameter leaf
    (43 on the flagship VQ-VAE — 2.15 ms/step of the 9.3 ms step on a
    v5e, each running far below HBM bandwidth). Flattening the update to
    one vector turns Adam + global-norm clip + weight decay + parameter
    EMA into two large fusions over contiguous memory (PERF.md "flat
    fused optimizer"). Math is optax.adam-equivalent (bias-corrected,
    eps outside the sqrt), with the make_optimizer chain order
    (clip -> weight decay -> adam) preserved.

    Best with replicated parameters (the data-parallel/trainer path,
    where TrainState is always replicated). Under tensor-parallel param
    shardings the flat vector forces an all-gather per step — pass
    ``fused=False`` to ``create_train_state`` there.
    """

    count: jnp.ndarray
    m: jnp.ndarray
    v: jnp.ndarray
    lr: Any = flax.struct.field(pytree_node=False, default=1e-3)
    b1: float = flax.struct.field(pytree_node=False, default=0.9)
    b2: float = flax.struct.field(pytree_node=False, default=0.999)
    eps: float = flax.struct.field(pytree_node=False, default=1e-8)
    clip: float = flax.struct.field(pytree_node=False, default=-1.0)
    wd: float = flax.struct.field(pytree_node=False, default=0.0)
    unravel: Any = flax.struct.field(pytree_node=False, default=None)


def _is_deleted(leaf) -> bool:
    try:
        return isinstance(leaf, jax.Array) and leaf.is_deleted()
    except Exception:
        return False


def _zeros_like_tree(params):
    """Same shapes/dtypes, fresh zero buffers — safe to build even when
    ``params`` leaves were donated (creation never reads the values)."""
    return jax.tree_util.tree_map(
        lambda p: jnp.zeros(jnp.shape(p), jnp.result_type(p)), params
    )


def _fused_opt_init(params, cfg: TrainConfig, use_schedule: bool) -> FusedOptState:
    # build unravel + moments from a zeros tree: metadata only, so a
    # TrainState template can be created from donated variables (the
    # in-process checkpoint-restore pattern after donated training)
    flat, unravel = ravel_pytree(_zeros_like_tree(params))
    moment_dtype = (
        jnp.bfloat16 if getattr(cfg, "bf16_moments", False) else jnp.float32
    )
    zeros = jnp.zeros_like(flat, dtype=moment_dtype)
    lr = (
        make_lr_schedule(cfg)
        if use_schedule
        else float(cfg.initial_learning_rate)
    )
    return FusedOptState(
        count=jnp.zeros((), jnp.int32),
        m=zeros,
        v=jnp.zeros_like(zeros),
        lr=lr,
        b1=float(cfg.adam_beta1),
        b2=float(cfg.adam_beta2),
        eps=float(cfg.adam_eps),
        clip=float(cfg.clip_thresh or -1.0),
        wd=float(cfg.weight_decay or 0.0),
        unravel=unravel,
    )


def resolve_ema_decay(ema_decay, ema_warmup: bool, step):
    """The single source of the EMA decay schedule: the reference's
    fixed decay (hparams.py:118), optionally ramped
    min(decay, (1+t)/(10+t)) under TrainConfig.ema_warmup. ``step`` is
    the 0-based step BEFORE the increment (t = step + 1)."""
    if not ema_warmup:
        return ema_decay
    t = jnp.asarray(step + 1, jnp.float32)
    return jnp.minimum(ema_decay, (1.0 + t) / (10.0 + t))


def _use_pallas_fused() -> bool:
    """Opt-in (NSG_FUSED_OPT=pallas) single-pass Pallas lowering of the
    fused optimizer update; TPU backend only. Read at trace time."""
    import os

    if os.environ.get("NSG_FUSED_OPT", "xla") != "pallas":
        return False
    from neural_sound_generation_tpu.ops.pallas.fused_adam import supported

    return supported()


def fused_flat_update(s: FusedOptState, count, m, v, flat_p, flat_g,
                      ema, ema_decay: float, ema_warmup: bool, step):
    """One fused Adam(+EMA) update on flat f32 vectors — the single
    source of truth for the fused-optimizer math. Used by
    ``TrainState._apply_gradients_fused`` (per-step ravel path) and by
    the flat-carry multi-step scan (``trainer.make_multistep_train``,
    which ravels once per launch instead of once per step — measured
    +8.6% flagship steps/s, PERF.md "Flat-carry multi-step").

    ``s`` supplies hyperparameters only; the mutable slots (count, m, v,
    flat_p, ema) are explicit so a scan can carry them. Returns
    (new_flat_p, m, v, ema, count, grad_norm) with grad_norm taken on
    the raw (pre-clip, pre-weight-decay) gradient.

    With ``NSG_FUSED_OPT=pallas`` on the TPU backend the elementwise
    update runs as ONE Pallas pass over the flat vectors
    (ops/pallas/fused_adam.py, in-place aliased) instead of XLA's
    fusion chain; the global grad norm stays an XLA reduction either
    way. Same math, A/B parity-tested."""
    flat_g = flat_g.astype(jnp.float32)
    gnorm = jnp.linalg.norm(flat_g)
    if _use_pallas_fused():
        from neural_sound_generation_tpu.ops.pallas.fused_adam import (
            fused_adam_update,
        )

        count_inc = count + 1
        gscale = (
            jnp.minimum(1.0, s.clip / jnp.maximum(gnorm, 1e-12))
            if s.clip > 0 else jnp.float32(1.0)
        )
        lr_now = s.lr(count) if callable(s.lr) else s.lr
        d = (
            jnp.asarray(resolve_ema_decay(ema_decay, ema_warmup, step),
                        jnp.float32)
            if ema is not None else jnp.float32(0.0)
        )
        new_p, new_m, new_v, new_ema = fused_adam_update(
            flat_g, flat_p, m, v, ema, gscale, lr_now,
            count_inc.astype(jnp.float32), d,
            b1=s.b1, b2=s.b2, eps=s.eps, clip=s.clip > 0, wd=s.wd,
            has_ema=ema is not None,
        )
        return new_p, new_m, new_v, new_ema, count_inc, gnorm
    if s.clip > 0:
        flat_g = flat_g * jnp.minimum(1.0, s.clip / jnp.maximum(gnorm, 1e-12))
    if s.wd > 0:
        flat_g = flat_g + s.wd * flat_p
    count_inc = count + 1
    # moments may be stored bf16 (TrainConfig.bf16_moments — halves the
    # bandwidth-bound optimizer stage's bytes); the update math runs in
    # f32 either way and rounds back on store
    m_f32 = s.b1 * m.astype(jnp.float32) + (1.0 - s.b1) * flat_g
    v_f32 = s.b2 * v.astype(jnp.float32) + (1.0 - s.b2) * flat_g * flat_g
    cf = count_inc.astype(jnp.float32)
    m_hat = m_f32 / (1.0 - s.b1**cf)
    v_hat = v_f32 / (1.0 - s.b2**cf)
    # optax evaluates schedules at the PRE-increment count
    # (scale_by_schedule semantics); bias correction uses count_inc
    lr = s.lr(count) if callable(s.lr) else s.lr
    new_flat_p = flat_p - lr * m_hat / (jnp.sqrt(v_hat) + s.eps)
    new_ema = ema  # flat f32 vector under the fused path
    if new_ema is not None:
        d = resolve_ema_decay(ema_decay, ema_warmup, step)
        new_ema = d * new_ema + (1.0 - d) * new_flat_p
    return (new_flat_p, m_f32.astype(m.dtype), v_f32.astype(v.dtype),
            new_ema, count_inc, gnorm)


class TrainState(flax.struct.PyTreeNode):
    """Functional train state (pure pytree; safe under pjit/donation)."""

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    ema_params: Optional[Any]
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.0)
    ema_warmup: bool = flax.struct.field(pytree_node=False, default=False)
    # EMA-codebook auxiliary statistics (VQ-VAE v2 style updates,
    # ModelConfig.ema_codebook): {"cluster": (K,), "embed_sum": (K, D)}
    codebook_ema: Optional[Any] = None

    def apply_gradients(self, grads, new_batch_stats=None):
        if isinstance(self.opt_state, FusedOptState):
            return self._apply_gradients_fused(grads, new_batch_stats)
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            d = self._ema_decay_now()
            new_ema = jax.tree_util.tree_map(
                lambda e, p: d * e + (1.0 - d) * p, new_ema, new_params
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )

    def _apply_gradients_fused(self, grads, new_batch_stats=None):
        s: FusedOptState = self.opt_state
        flat_g, _ = ravel_pytree(grads)
        flat_p, _ = ravel_pytree(self.params)
        new_flat_p, m, v, new_ema, count, _ = fused_flat_update(
            s, s.count, s.m, s.v, flat_p, flat_g, self.ema_params,
            self.ema_decay, self.ema_warmup, self.step,
        )
        return self.replace(
            step=self.step + 1,
            params=s.unravel(new_flat_p),
            opt_state=s.replace(count=count, m=m, v=v),
            ema_params=new_ema,
            batch_stats=(
                new_batch_stats if new_batch_stats is not None else self.batch_stats
            ),
        )

    def _ema_decay_now(self):
        """EMA decay for this step. Default: the reference's fixed decay
        (src/dataloader.py:246-257, ``averaged = decay*averaged +
        (1-decay)*x`` with ema_decay=0.9999, hparams.py:118). With
        ``TrainConfig.ema_warmup`` (a deliberate deviation, off by
        default): tf.train.ExponentialMovingAverage ``num_updates``-style
        ramp min(decay, (1+t)/(10+t)), which keeps the shadow from
        staying frozen at the init weights for the first ~10k steps of
        short runs."""
        if not self.ema_warmup:
            return self.ema_decay
        t = (self.step + 1).astype(jnp.float32)
        return jnp.minimum(self.ema_decay, (1.0 + t) / (10.0 + t))

    @property
    def eval_params(self):
        """EMA params when enabled, else live params (the reference's
        intended averaged-model evaluation, hparams.py:116-118)."""
        if self.ema_params is None:
            return self.params
        if isinstance(self.opt_state, FusedOptState):
            return self.opt_state.unravel(self.ema_params)
        return self.ema_params


def make_optimizer(cfg: TrainConfig, use_schedule: bool = False):
    """Adam matching reference hyperparameters (hparams.py:99-110,
    main.py:124: plain Adam(lr) — schedule off by default for parity)."""
    lr = make_lr_schedule(cfg) if use_schedule else cfg.initial_learning_rate
    tx = optax.adam(
        learning_rate=lr,
        b1=cfg.adam_beta1,
        b2=cfg.adam_beta2,
        eps=cfg.adam_eps,
    )
    chain = []
    if cfg.clip_thresh and cfg.clip_thresh > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_thresh))
    if cfg.weight_decay and cfg.weight_decay > 0:
        chain.append(optax.add_decayed_weights(cfg.weight_decay))
    chain.append(tx)
    return optax.chain(*chain) if len(chain) > 1 else tx


def create_train_state(
    variables: FrozenDict | dict,
    cfg: TrainConfig,
    use_schedule: bool = False,
    ema_codebook: bool = False,
    fused: Optional[bool] = None,
) -> TrainState:
    """``fused`` selects the flat fused optimizer (FusedOptState); None
    follows ``cfg.fused_optimizer``. Disable under tensor-parallel param
    shardings (the flat moments would force a per-step all-gather)."""
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if fused is None:
        fused = cfg.fused_optimizer
    tx = make_optimizer(cfg, use_schedule)
    # donated-variables templates (in-process restore after donated
    # training): initialize EMA from zeros instead of reading deleted
    # buffers — a restore overwrites the value anyway
    params_live = not any(
        _is_deleted(leaf) for leaf in jax.tree_util.tree_leaves(params)
    )
    ema_src = params if params_live else _zeros_like_tree(params)
    if fused:
        ema = (
            ravel_pytree(ema_src)[0].astype(jnp.float32)
            if cfg.exponential_moving_average
            else None
        )
    else:
        ema = (
            jax.tree_util.tree_map(jnp.copy, ema_src)
            if cfg.exponential_moving_average
            else None
        )
    cb_ema = None
    if ema_codebook and "codebook" not in params:
        # only the single-codebook families support EMA updates; the
        # hierarchical model trains codebook_top/_bottom by gradient
        ema_codebook = False
    if ema_codebook:
        cb = ema_src["codebook"]  # == params["codebook"] when live
        # cluster sizes start at 1 (not 0): embed_sum/cluster == codebook
        # at init, and early updates never divide by a near-zero count.
        # Shapes generalize to residual VQ: (Q, K, D) codebooks get (Q, K)
        # clusters.
        cb_ema = {
            "cluster": jnp.ones(cb.shape[:-1], jnp.float32),
            "embed_sum": jnp.array(cb, jnp.float32),
        }
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=(
            _fused_opt_init(params, cfg, use_schedule)
            if fused
            else tx.init(params)
        ),
        ema_params=ema,
        tx=tx,
        ema_decay=cfg.ema_decay,
        ema_warmup=cfg.ema_warmup,
        codebook_ema=cb_ema,
    )
