"""Training step and epoch driver.

Rebuilds the reference's per-model epoch loops (src/train.py:18-179,
src/test.py:11-106) as one jitted train step over a device mesh: the
whole forward/backward/update is a single XLA program; with the batch
axis sharded over the mesh's 'data' axis, GSPMD emits the gradient
all-reduce over ICI (no DataParallel/NCCL analogue needed).

The reference's output-width "hack" (zero-padding the decoder output to
the input width, train.py:118-120) is unnecessary here: the data pipeline
crops mel frames to a multiple of the encoder's total stride, so decoder
output shape equals input shape exactly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from neural_sound_generation_tpu.config import Config
from neural_sound_generation_tpu.models import (
    VAE,
    VQVAE,
    GatedPixelCNN,
    HierVQVAE,
    TransformerPrior,
    WaveNet,
    WaveVQVAE,
)
from neural_sound_generation_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
    shard_batch,
)
from neural_sound_generation_tpu.training.losses import (
    codebook_perplexity,
    discretized_mix_logistic_loss,
    elbo_mse,
    hier_vqvae_loss,
    masked_cross_entropy,
    vqvae_loss,
)
from neural_sound_generation_tpu.training.train_state import (
    FusedOptState,
    TrainState,
    fused_flat_update,
)


def _vqvae_loss_fn(model: VQVAE, beta: float):
    def loss_fn(params, batch_stats, batch, rng):
        (x_tilde, z_e, z_q), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            train=True,
            g=batch.get("g"),
            mutable=["batch_stats"],
        )
        total, metrics = vqvae_loss(x_tilde, batch["x"], z_e, z_q, beta)
        return total, (metrics, mut.get("batch_stats", batch_stats), z_e)

    return loss_fn


def _vae_loss_fn(model: VAE):
    def loss_fn(params, batch_stats, batch, rng):
        (x_tilde, kl), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            train=True,
            mutable=["batch_stats"],
            rngs={"sample": rng},
        )
        total = elbo_mse(x_tilde, batch["x"], kl)
        metrics = {"loss": total, "kl": kl}
        return total, (metrics, mut.get("batch_stats", batch_stats), None)

    return loss_fn


def _wave_vqvae_loss_fn(model: WaveVQVAE, beta: float):
    """3-term VQ loss for the waveform family: reconstruction is MSE for
    scalar input and cross-entropy for mulaw-quantize (softmax output
    convention, src/hparams.py:18-21)."""

    def loss_fn(params, batch_stats, batch, rng):
        (out, z_e, z_q), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            train=True,
            g=batch.get("g"),
            mutable=["batch_stats"],
        )
        if model.categorical:
            loss_recons = masked_cross_entropy(
                out, batch["x"], batch.get("input_lengths")
            )
        else:
            loss_recons = jnp.mean((out - batch["x"]) ** 2)
        loss_vq = jnp.mean((z_q - jax.lax.stop_gradient(z_e)) ** 2)
        loss_commit = jnp.mean((z_e - jax.lax.stop_gradient(z_q)) ** 2)
        total = loss_recons + loss_vq + beta * loss_commit
        metrics = {
            "loss": total,
            "loss_recons": loss_recons,
            "loss_vq": loss_vq,
            "loss_commit": loss_commit,
            "train_loss": loss_recons + loss_vq,
        }
        return total, (metrics, mut.get("batch_stats", batch_stats), z_e)

    return loss_fn


def _hier_vqvae_loss_fn(model: HierVQVAE, beta: float):
    def loss_fn(params, batch_stats, batch, rng):
        (x_tilde, top, bottom), mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["x"],
            train=True,
            mutable=["batch_stats"],
        )
        total, metrics = hier_vqvae_loss(
            x_tilde, batch["x"], (top, bottom), beta
        )
        # z_e slot feeds the EMA-codebook path, which is single-codebook
        # only; hier uses gradient codebooks (make_train_step gates it off)
        return total, (metrics, mut.get("batch_stats", batch_stats), None)

    return loss_fn


def _pixelcnn_loss_fn(model):
    """Prior NLL over code grids — shared by GatedPixelCNN and
    TransformerPrior (same call signature). Batch: {"codes": (B, H, W)
    int, "labels": (B,) int[, "cond": (B, H, W, C) for the spatially
    conditioned bottom prior]}. The reference ships the GatedPixelCNN
    with no training loop at all (src/models.py:285-341, SURVEY §8)."""

    routed = getattr(model, "n_experts", 0) > 0
    aux_weight = 0.01  # Switch-paper default load-balance coefficient

    def loss_fn(params, batch_stats, batch, rng):
        args = (batch["codes"], batch["labels"])
        if model.spatial_cond:
            args = args + (batch["cond"],)
        if routed:
            # MoE blocks sow their load-balance terms into 'moe_losses'
            logits, muts = model.apply(
                {"params": params}, *args, mutable=["moe_losses"]
            )
        else:
            logits = model.apply({"params": params}, *args)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, batch["codes"][..., None], axis=-1)
        nll = jnp.mean(nll)
        loss = nll
        metrics = {"loss": nll, "nll_per_code": nll}
        if routed:
            aux_terms = jax.tree_util.tree_leaves(muts["moe_losses"])
            aux = sum(aux_terms) / max(1, len(aux_terms))
            loss = nll + aux_weight * aux
            metrics["moe_load_balance"] = aux
        return loss, (metrics, batch_stats, None)

    return loss_fn


def _wavenet_loss_fn(model: WaveNet, cfg: Config):
    """Mel-conditioned vocoder: teacher-forced MoL loss for scalar input,
    masked CE for mulaw-quantize (the reference's configured loss surface,
    src/hparams.py:18-21, 52-84). Batch: {"y": targets, "c": mel
    (B, T', n_mels)[, "g": (B,) speakers, "input_lengths": (B,)]}."""
    scalar = model.scalar_input

    def loss_fn(params, batch_stats, batch, rng):
        targets = batch["y"]
        x = WaveNet.shift_inputs(targets, scalar)
        y_hat = model.apply(
            {"params": params}, x, batch.get("c"), batch.get("g")
        )
        lengths = batch.get("input_lengths")
        if scalar:
            loss = discretized_mix_logistic_loss(
                y_hat, targets,
                num_classes=cfg.audio.quantize_channels,
                log_scale_min=cfg.arch.log_scale_min,
                lengths=lengths,
            )
        else:
            loss = masked_cross_entropy(y_hat, targets, lengths)
        return loss, ({"loss": loss}, batch_stats, None)

    return loss_fn


def _select_loss_fn(model, cfg: Config, remat: bool = False):
    """Per-family loss closure (params, batch_stats, batch, rng) ->
    (loss, (metrics, new_batch_stats, z_e))."""
    if isinstance(model, WaveVQVAE):
        loss_fn = _wave_vqvae_loss_fn(model, cfg.model.beta)
    elif isinstance(model, HierVQVAE):
        loss_fn = _hier_vqvae_loss_fn(model, cfg.model.beta)
    elif isinstance(model, VQVAE):
        loss_fn = _vqvae_loss_fn(model, cfg.model.beta)
    elif isinstance(model, VAE):
        loss_fn = _vae_loss_fn(model)
    elif isinstance(model, (GatedPixelCNN, TransformerPrior)):
        loss_fn = _pixelcnn_loss_fn(model)
    elif isinstance(model, WaveNet):
        loss_fn = _wavenet_loss_fn(model, cfg)
    else:
        raise TypeError(f"unsupported model: {type(model)}")
    if remat:
        loss_fn = jax.checkpoint(loss_fn, static_argnums=())
    return loss_fn


def _uses_ema_codebook(model, cfg: Config) -> bool:
    # EMA codebook updates are wired for the single-codebook families;
    # the hierarchical model trains its two codebooks by gradient
    return bool(
        cfg.model.ema_codebook and isinstance(model, (VQVAE, WaveVQVAE))
    )


def make_train_step(
    model,
    cfg: Config,
    mesh=None,
    donate: bool = True,
    remat: bool = False,
    state_shardings=None,
) -> Callable[[TrainState, Dict[str, jnp.ndarray], jax.Array], Tuple[TrainState, Dict]]:
    """One jitted optimization step. With ``mesh``, the batch is expected
    sharded over 'data' and the state replicated; XLA inserts the gradient
    all-reduce. ``state_shardings`` (a TrainState-shaped sharding tree,
    ``training.sharding.train_state_shardings``) overrides the replicated
    state layout — the tensor-parallel path: parameters stay resident in
    their 'model'-axis shards across steps instead of being re-gathered.

    ``remat`` wraps the forward in ``jax.checkpoint`` — activations are
    recomputed in the backward pass, trading ~1/3 more FLOPs for O(depth)
    less HBM (the standard lever for fitting larger models/batches)."""
    loss_fn = _select_loss_fn(model, cfg, remat)
    ema_codebook = _uses_ema_codebook(model, cfg)

    def train_step(state: TrainState, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (metrics, new_bs, z_e)), grads = grad_fn(
            state.params, state.batch_stats, batch, rng
        )
        if ema_codebook:
            # codebook learns by EMA cluster statistics, not gradients
            # (ModelConfig.ema_codebook; VQ-VAE-2-style updates)
            grads = dict(grads)
            grads["codebook"] = jnp.zeros_like(grads["codebook"])
        new_state = state.apply_gradients(grads, new_bs)
        if ema_codebook:
            from neural_sound_generation_tpu.ops.vq import (
                codebook_ema_update,
                residual_codebook_ema_update,
                residual_vq,
                vq,
            )

            flat = z_e.reshape(-1, z_e.shape[-1])
            cb = state.params["codebook"]
            if cb.ndim == 3:  # residual VQ: per-stage EMA
                _, _, indices = residual_vq(flat, cb)
                new_cb, cluster, esum, residuals = residual_codebook_ema_update(
                    cb,
                    state.codebook_ema["cluster"],
                    state.codebook_ema["embed_sum"],
                    flat,
                    indices,
                    decay=cfg.model.ema_codebook_decay,
                    return_residuals=True,
                )
            else:
                indices = vq(flat, cb)
                new_cb, cluster, esum = codebook_ema_update(
                    cb,
                    state.codebook_ema["cluster"],
                    state.codebook_ema["embed_sum"],
                    flat,
                    indices,
                    decay=cfg.model.ema_codebook_decay,
                )
            if cfg.model.restart_dead_threshold > 0:
                from neural_sound_generation_tpu.ops.vq import restart_dead_codes

                # pass the EMA stats so restarted rows restart their
                # statistics too — otherwise the next EMA update rebuilds
                # the row from the stale sums and reverts the restart
                if new_cb.ndim == 3:
                    # candidates come from each stage's OWN residual
                    # inputs (raw z_e is at the wrong scale for stage 1+)
                    restarted = [
                        restart_dead_codes(
                            new_cb[q], cluster[q], residuals[q],
                            jax.random.fold_in(rng, q),
                            threshold=cfg.model.restart_dead_threshold,
                            cluster=cluster[q], embed_sum=esum[q],
                        )
                        for q in range(new_cb.shape[0])
                    ]
                    new_cb = jnp.stack([r[0] for r in restarted])
                    cluster = jnp.stack([r[1] for r in restarted])
                    esum = jnp.stack([r[2] for r in restarted])
                else:
                    new_cb, cluster, esum = restart_dead_codes(
                        new_cb, cluster, flat, rng,
                        threshold=cfg.model.restart_dead_threshold,
                        cluster=cluster, embed_sum=esum,
                    )
            params = dict(new_state.params)
            params["codebook"] = new_cb
            new_state = new_state.replace(
                params=params,
                codebook_ema={"cluster": cluster, "embed_sum": esum},
            )
        metrics["grad_norm"] = optax_global_norm(grads)
        return new_state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(train_step, donate_argnums=donate_argnums)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else rep
    return jax.jit(
        train_step,
        in_shardings=(state_sh, data, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=donate_argnums,
    )


def make_multistep_train(
    model, cfg: Config, n_inner: int, donate: bool = True, mesh=None,
    state_shardings=None,
):
    """N optimization steps inside ONE jitted program via ``lax.scan``.

    On this backend the per-call dispatch floor (~300us through the
    tunnel) dominates small-batch steps; scanning n_inner steps amortizes
    it to one launch. Takes a stacked super-batch (every array leaf gains
    a leading (n_inner,) axis) and returns (state, stacked metrics).

    With ``mesh``, each scanned step is data-parallel: the super-batch is
    expected sharded as (scan, 'data', ...) and GSPMD emits one gradient
    all-reduce per inner step, all inside the single launch.

    Fused-optimizer states scan a FLAT carry: params/moments/EMA ride
    the loop as flat f32 vectors (autodiff emits the flat gradient
    directly), and the tree<->flat ravels run once per LAUNCH instead of
    once per step. The per-step ravel/unravel copies were ~8.6% of the
    flagship step (measured, PERF.md "Flat-carry multi-step"); the
    tree-state path below remains for legacy optimizers and the
    EMA-codebook families (which edit the params tree mid-step).
    """
    inner = make_train_step(model, cfg, donate=False)
    # unwrap: use the underlying python callable so scan traces it inline
    inner_fn = inner.__wrapped__
    loss_fn = _select_loss_fn(model, cfg)
    ema_codebook = _uses_ema_codebook(model, cfg)

    def multi_flat(state: TrainState, batches, rng):
        from jax.flatten_util import ravel_pytree

        s = state.opt_state
        flat_p, _ = ravel_pytree(state.params)

        def flat_loss(flat, bs, batch, sub):
            return loss_fn(s.unravel(flat), bs, batch, sub)

        has_ema = state.ema_params is not None

        def body(carry, batch):
            flat, bs, m, v, ema, count, step, rng = carry
            rng, sub = jax.random.split(rng)
            (_, (metrics, new_bs, _)), flat_g = jax.value_and_grad(
                flat_loss, has_aux=True
            )(flat, bs, batch, sub)
            flat, m, v, ema, count, gnorm = fused_flat_update(
                s, count, m, v, flat, flat_g,
                ema if has_ema else None,
                state.ema_decay, state.ema_warmup, step,
            )
            metrics["grad_norm"] = gnorm
            return (
                flat, new_bs if new_bs is not None else bs,
                m, v, ema if has_ema else carry[4], count, step + 1, rng,
            ), metrics

        carry0 = (
            flat_p, state.batch_stats, s.m, s.v,
            state.ema_params if has_ema else jnp.zeros((), jnp.float32),
            s.count, state.step, rng,
        )
        (flat_p, bs, m, v, ema, count, step, _), metrics = jax.lax.scan(
            body, carry0, batches
        )
        new_state = state.replace(
            step=step,
            params=s.unravel(flat_p),
            batch_stats=bs,
            opt_state=s.replace(count=count, m=m, v=v),
            ema_params=ema if has_ema else None,
        )
        return new_state, metrics

    def multi(state, batches, rng):
        if isinstance(state.opt_state, FusedOptState) and not ema_codebook:
            return multi_flat(state, batches, rng)
        def body(carry, batch):
            state, rng = carry
            rng, sub = jax.random.split(rng)
            state, metrics = inner_fn(state, batch, sub)
            return (state, rng), metrics

        (state, _), metrics = jax.lax.scan(body, (state, rng), batches)
        return state, metrics

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(multi, donate_argnums=donate_argnums)
    from jax.sharding import NamedSharding, PartitionSpec as P

    rep = replicated_sharding(mesh)
    scan_data = NamedSharding(mesh, P(None, "data"))
    state_sh = state_shardings if state_shardings is not None else rep
    return jax.jit(
        multi,
        in_shardings=(state_sh, scan_data, rep),
        out_shardings=(state_sh, rep),
        donate_argnums=donate_argnums,
    )


def stack_batches(batches):
    """List of dict batches -> one super-batch with a leading scan axis.

    Stacks on the HOST (np.stack): loader batches are host numpy, and a
    jnp.stack would stage the super-batch on the default device only for
    Trainer._put to re-transfer it with the (scan, 'data') sharding — a
    double host->HBM copy per launch in the hot loop. Device arrays
    (e.g. tests feeding jnp inputs) still stack fine through np.asarray."""
    import numpy as np

    keys = batches[0].keys()
    return {
        k: np.stack([np.asarray(b[k]) for b in batches])
        for k in keys
        if batches[0][k] is not None
    }


def optax_global_norm(tree) -> jnp.ndarray:
    # one reduce over the raveled vector, not one per leaf — and CSE
    # merges the concatenate with the fused optimizer's own ravel
    from jax.flatten_util import ravel_pytree

    flat, _ = ravel_pytree(tree)
    return jnp.linalg.norm(flat.astype(jnp.float32))


def make_eval_step(model, cfg: Config, mesh=None, use_ema: bool = True,
                   state_shardings=None):
    """Eval forward: returns reconstruction + per-batch metrics
    (the reference test_vqvae/test_vae accumulation, src/test.py:73-106)."""

    def eval_step(state: TrainState, batch):
        params = state.eval_params if use_ema else state.params
        variables = {"params": params, "batch_stats": state.batch_stats}
        if isinstance(model, WaveVQVAE):
            out, z_e, z_q = model.apply(
                variables, batch["x"], train=False, g=batch.get("g")
            )
            if model.categorical:
                loss_recons = masked_cross_entropy(
                    out, batch["x"], batch.get("input_lengths")
                )
            else:
                loss_recons = jnp.mean((out - batch["x"]) ** 2)
            loss_vq = jnp.mean((z_q - z_e) ** 2)
            metrics = {"loss": loss_recons + loss_vq, "loss_recons": loss_recons}
            indices = model.apply(
                variables, batch["x"], train=False, method=WaveVQVAE.encode
            )
            metrics["perplexity"] = codebook_perplexity(indices, model.z_dim)
            return out, metrics
        if isinstance(model, HierVQVAE):
            x_tilde, top, bottom = model.apply(
                variables, batch["x"], train=False
            )
            _, metrics = hier_vqvae_loss(
                x_tilde, batch["x"], (top, bottom), cfg.model.beta
            )
            idx_t, idx_b = model.apply(
                variables, batch["x"], train=False, method=HierVQVAE.encode
            )
            metrics["perplexity_top"] = codebook_perplexity(idx_t, model.k_top)
            metrics["perplexity"] = codebook_perplexity(idx_b, model.z_dim)
            return x_tilde, metrics
        if isinstance(model, VQVAE):
            x_tilde, z_e, z_q = model.apply(
                variables, batch["x"], train=False, g=batch.get("g")
            )
            _, metrics = vqvae_loss(x_tilde, batch["x"], z_e, z_q, cfg.model.beta)
            indices = model.apply(
                variables, batch["x"], train=False, method=VQVAE.encode
            )
            metrics["perplexity"] = codebook_perplexity(indices, model.z_dim)
            return x_tilde, metrics
        if isinstance(model, (GatedPixelCNN, TransformerPrior)):
            args = (batch["codes"], batch["labels"])
            if model.spatial_cond:
                args = args + (batch["cond"],)
            logits = model.apply({"params": params}, *args)
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = jnp.mean(
                -jnp.take_along_axis(logp, batch["codes"][..., None], axis=-1)
            )
            return logits, {"loss": nll, "nll_per_code": nll}
        if isinstance(model, WaveNet):
            targets = batch["y"]
            x = WaveNet.shift_inputs(targets, model.scalar_input)
            y_hat = model.apply(
                {"params": params}, x, batch.get("c"), batch.get("g")
            )
            lengths = batch.get("input_lengths")
            if model.scalar_input:
                loss = discretized_mix_logistic_loss(
                    y_hat, targets,
                    num_classes=cfg.audio.quantize_channels,
                    log_scale_min=cfg.arch.log_scale_min,
                    lengths=lengths,
                )
            else:
                loss = masked_cross_entropy(y_hat, targets, lengths)
            return y_hat, {"loss": loss}
        x_tilde, kl = model.apply(variables, batch["x"], train=False)
        total = elbo_mse(x_tilde, batch["x"], kl)
        return x_tilde, {"loss": total, "kl": kl}

    if mesh is None:
        return jax.jit(eval_step)
    rep = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    state_sh = state_shardings if state_shardings is not None else rep
    return jax.jit(
        eval_step, in_shardings=(state_sh, data), out_shardings=(rep, rep)
    )


class Trainer:
    """Epoch driver: train epochs, periodic eval, metric aggregation.

    Host-side shell around the jitted step — the replacement for
    src/train.py's per-model epoch loops, with correct epoch averaging
    (the reference overwrites train_loss per batch, train.py:138,
    SURVEY §8)."""

    def __init__(
        self,
        model,
        cfg: Config,
        state: TrainState,
        mesh=None,
        log_fn: Optional[Callable[[str], None]] = print,
        metrics_path: Optional[str] = None,
        multi_steps: int = 1,
        tensor_parallel: bool = False,
    ):
        self.model = model
        self.cfg = cfg
        self.state = state
        self.mesh = mesh
        self.log_fn = log_fn or (lambda s: None)
        # structured per-epoch scalar log (JSONL) — the observability the
        # reference lacks (SURVEY §5: print-only)
        self.metrics_path = metrics_path
        # multi_steps > 1: scan N optimization steps per device launch
        # (amortizes the dispatch floor; see make_multistep_train)
        self.multi_steps = max(1, multi_steps)
        # tensor parallelism: shard codebook rows + conv output channels
        # over the mesh's 'model' axis (parallel/mesh._TP_RULES) and keep
        # the state resident in that layout across steps
        state_sh = None
        self.tensor_parallel = bool(
            tensor_parallel
            and mesh is not None
            and mesh.shape.get("model", 1) > 1
        )
        if self.tensor_parallel:
            from neural_sound_generation_tpu.training.sharding import (
                shard_train_state,
                train_state_shardings,
            )
            from neural_sound_generation_tpu.training.train_state import (
                FusedOptState,
            )

            if isinstance(state.opt_state, FusedOptState):
                raise ValueError(
                    "tensor parallelism requires per-leaf optimizer "
                    "moments: build the state with "
                    "create_train_state(..., fused=False)"
                )
            self.state = shard_train_state(state, mesh, tensor_parallel=True)
            state_sh = train_state_shardings(state, mesh, tensor_parallel=True)
        self._train_step = make_train_step(
            model, cfg, mesh, state_shardings=state_sh
        )
        self._multi_step = (
            make_multistep_train(
                model, cfg, self.multi_steps, mesh=mesh, state_shardings=state_sh
            )
            if self.multi_steps > 1
            else None
        )
        self._eval_step = make_eval_step(model, cfg, mesh, state_shardings=state_sh)

    def _write_metrics(self, record: Dict):
        if not self.metrics_path:
            return
        import json

        with open(self.metrics_path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")

    def _put(self, batch, super_batch: bool = False):
        if self.mesh is None:
            return batch
        if super_batch:
            # stacked (scan, batch, ...) super-batches shard the SECOND
            # axis over 'data'; the leading axis is the scan dimension
            from jax.sharding import NamedSharding, PartitionSpec as P

            sharding = NamedSharding(self.mesh, P(None, "data"))
            if jax.process_count() > 1:
                # per-host loader slices -> one global array (see
                # parallel.mesh.shard_batch)
                return jax.tree_util.tree_map(
                    lambda x: jax.make_array_from_process_local_data(
                        sharding, x
                    ),
                    batch,
                )
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sharding), batch
            )
        return shard_batch(batch, self.mesh)

    def train_epoch(self, batches, rng: jax.Array, epoch: int = 0,
                    checkpoint_cb=None):
        """batches: iterable of dict batches (host numpy or device arrays).
        Returns mean metrics over the epoch.

        ``checkpoint_cb(state, step)`` is invoked every
        ``cfg.train.checkpoint_interval`` optimization steps — the per-step
        interval the reference configures but never consumes
        (hparams.py:122).

        Metric sums accumulate as device scalars (async dispatch, no
        host round-trip) and are pulled once per epoch; only the
        log_interval print and the checkpoint callback synchronize."""
        sums: Optional[Dict[str, jnp.ndarray]] = None
        count = 0
        interval = self.cfg.train.checkpoint_interval
        step_now = int(jax.device_get(self.state.step))
        step_incr = self.multi_steps if self._multi_step is not None else 1
        if self._multi_step is not None:
            batches = self._chunk_batches(batches)
        for i, batch in enumerate(batches):
            rng, step_rng = jax.random.split(rng)
            if self._multi_step is not None:
                self.state, stacked = self._multi_step(
                    self.state, self._put(batch, super_batch=True), step_rng
                )
                metrics = jax.tree_util.tree_map(lambda v: v.mean(), stacked)
            else:
                self.state, metrics = self._train_step(
                    self.state, self._put(batch), step_rng
                )
            count += 1
            step_now += step_incr
            if (
                self.cfg.train.log_interval
                and i % self.cfg.train.log_interval == 0
            ):
                m = {k: float(v) for k, v in metrics.items()}
                self.log_fn(
                    f"Train Epoch: {epoch} [{i}]\t"
                    + " ".join(f"{k}={v:.6f}" for k, v in sorted(m.items()))
                )
            if sums is None:
                sums = dict(metrics)
            else:
                # seed late-appearing keys at 0 (a step can emit a metric
                # absent from the first batch); stays device-side
                sums = {k: sums.get(k, 0.0) + v for k, v in metrics.items()}
            if checkpoint_cb and interval:
                # host-side step counter mirrors state.step (one increment
                # per optimization step) without a device round-trip
                if step_now % interval < step_incr:
                    checkpoint_cb(self.state, step_now)
        pulled = (
            {k: float(v) for k, v in jax.device_get(sums).items()}
            if sums
            else {}
        )
        means = {k: v / max(count, 1) for k, v in pulled.items()}
        if count == 0:
            # a silent no-op epoch (batch_size or multi_steps x batch_size
            # exceeds the dataset after drop_last) trains nothing while
            # printing loss 0.0 — make the misconfiguration loud
            self.log_fn(
                f"WARNING: epoch {epoch} produced 0 training batches — "
                f"batch_size ({self.cfg.train.batch_size})"
                + (
                    f" x multi_steps ({self.multi_steps})"
                    if self._multi_step is not None
                    else ""
                )
                + " likely exceeds the training split after drop_last"
            )
        self.log_fn(
            f"====> Epoch: {epoch} Average loss: {means.get('loss', 0.0):.4f}"
        )
        self._write_metrics(
            {"phase": "train", "epoch": epoch, "batches": count, **means}
        )
        return means

    def _chunk_batches(self, batches):
        """Group mini-batches into stacked super-batches of multi_steps."""
        chunk = []
        for b in batches:
            chunk.append(b)
            if len(chunk) == self.multi_steps:
                yield stack_batches(chunk)
                chunk = []
        # drop the final partial chunk (static scan length); typically a
        # fraction of one launch per epoch

    def eval_epoch(self, batches):
        sums: Optional[Dict[str, jnp.ndarray]] = None
        count = 0
        last_recon = None
        for batch in batches:
            last_recon, metrics = self._eval_step(self.state, self._put(batch))
            count += 1
            if sums is None:
                sums = dict(metrics)
            else:
                # seed late-appearing keys at 0 (a step can emit a metric
                # absent from the first batch); stays device-side
                sums = {k: sums.get(k, 0.0) + v for k, v in metrics.items()}
        pulled = (
            {k: float(v) for k, v in jax.device_get(sums).items()}
            if sums
            else {}
        )
        means = {k: v / max(count, 1) for k, v in pulled.items()}
        self.log_fn(f"====> Test set loss: {means.get('loss', 0.0):.4f}")
        self._write_metrics({"phase": "test", "batches": count, **means})
        return means, last_recon
