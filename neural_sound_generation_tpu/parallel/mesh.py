"""Device mesh and sharding layout.

The reference's parallelism surface is vestigial (SURVEY.md §2a): NCCL
names in dead config (hparams_nvidia.py:18-19), an unwired rank-sliced
sampler (util.py:353-391), `DataParallel` imported but never used. The
TPU-native replacement is declarative: one ``jax.sharding.Mesh`` over all
chips with a ``data`` axis (batch sharding; gradient reduction compiles to
an ICI all-reduce) and a ``model`` axis (tensor-parallel sharding of the
codebook rows and wide conv channels via GSPMD annotations).
"""

from __future__ import annotations

import re
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with ('data', 'model') axes over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data * n_model} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def mesh_from_args(
    mesh_data: Optional[int],
    mesh_model: int,
    batch_size: int,
    log=print,
):
    """The CLIs' shared mesh policy (--mesh-data/--mesh-model flags):
    explicit --mesh-data wins; otherwise auto-build a mesh when the batch
    divides the device count; tensor parallelism without a mesh is an
    error. Returns (mesh | None, tensor_parallel). One helper instead of
    a copy per CLI (train/prior/vocoder) so the policy cannot drift."""
    tensor_parallel = mesh_model > 1
    n_dev = len(jax.devices())
    mesh = None
    if mesh_data:
        mesh = make_mesh(mesh_data, mesh_model)
    elif n_dev > 1 and batch_size % n_dev == 0:
        mesh = make_mesh(n_model=mesh_model)
    if mesh is not None:
        log(f"Mesh: {dict(mesh.shape)} over {n_dev} devices"
            + (" (tensor parallel)" if tensor_parallel else ""))
    elif tensor_parallel:
        raise SystemExit(
            f"--mesh-model {mesh_model} needs a device mesh: pass "
            f"--mesh-data too, or run with >= {mesh_model} devices"
        )
    return mesh, tensor_parallel


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Parameter path patterns -> which dim of the leaf shards over 'model'.
# A dim of -2 shards the codebook's codes axis (works for both the flat
# (K, D) codebook and the stacked residual (Q, K, D) one); -1 shards a
# conv/dense kernel's output channels regardless of kernel rank (2-D
# dense, 3-D Conv1D as in WaveVQVAE/WaveNet, 4-D Conv2D as in VQVAE/PixelCNN) —
# the spec is built from the leaf's actual rank, never hard-coded, so
# every model family shards without rank assumptions (round-1 bug:
# a fixed 4-dim spec raised IndexError on 3-dim Conv1D kernels).
_TP_RULES = (
    # -2 is the codes axis for both the flat (K, D) codebook and the
    # residual-VQ (Q, K, D) codebook stack
    (re.compile(r"\['codebook(_top|_bottom)?'\]$"), -2),
    (re.compile(r"\['(encoder|decoder)'\].*\['kernel'\]$"), -1),
    # WaveNet conv stack: dilated/cond/res/skip/post/first_conv kernels
    (
        re.compile(
            r"\['(dilated|cond|res|skip)_\d+'\]\['kernel'\]$|"
            r"\['(post1|post2|first_conv)'\]\['kernel'\]$|"
            r"\['upsampler'\].*\['kernel'\]$"
        ),
        -1,
    ),
    # GatedPixelCNN prior: masked vert/horiz kernels are raw params
    # (HWIO), the 1x1 stacks + output head are nn.Conv kernels, and the
    # class/code embeddings shard their feature axis — all -1 (the gate
    # split over a sharded 2*dim axis compiles the same way the WaveNet
    # gates do)
    (
        re.compile(
            r"\['layer_\d+'\]\['(vert|horiz)_kernel'\]$|"
            r"\['(vert_to_horiz|horiz_resid|spatial_cond"
            r"|out_hidden|out_logits)'\]\['kernel'\]$|"
            r"\['(embedding|class_cond_embedding)'\]\['embedding'\]$"
        ),
        -1,
    ),
    # TransformerPrior (Megatron layout): qkv/mlp-in kernels shard output
    # channels, the paired out-projections shard INPUT channels (-2) so
    # each block pays one all-reduce per residual join; embeddings, the
    # conditioning projection and the vocab head shard their feature axis
    (
        re.compile(
            r"\['block_\d+'\]\['(attn_qkv|mlp_in)'\]\['kernel'\]$"
        ),
        -1,
    ),
    (
        re.compile(
            r"\['block_\d+'\]\['(attn_out|mlp_out)'\]\['kernel'\]$"
        ),
        -2,
    ),
    (
        re.compile(
            r"\['(head|cond_proj)'\]\['kernel'\]$|"
            r"\['(tok_embed|class_embed|row_embed|col_embed)'\]"
            r"\['embedding'\]$"
        ),
        -1,
    ),
    # Switch-MoE expert weights/biases (E, D, F)/(E, F, D)/(E, F):
    # shard the EXPERT axis over 'model' — expert parallelism; GSPMD
    # turns the dispatch/combine einsums into the expert all-to-alls.
    # The router stays replicated (every token scores every expert).
    (
        re.compile(
            r"\['block_\d+'\]\['moe'\]\['(w_in|w_out|b_in|b_out)'\]$"
        ),
        0,
    ),
)


def _rule_spec(leaf, dim: int) -> Optional[P]:
    """PartitionSpec sharding ``dim`` of ``leaf`` over 'model', built from
    the leaf's actual rank. None if the leaf is too small to have that dim."""
    ndim = getattr(leaf, "ndim", len(getattr(leaf, "shape", ())))
    if ndim == 0:
        return None
    axis = dim if dim >= 0 else ndim + dim
    if not (0 <= axis < ndim):
        return None
    entries = [None] * ndim
    entries[axis] = "model"
    return P(*entries)


def model_param_shardings(params: Any, mesh: Mesh, tensor_parallel: bool = False):
    """Sharding pytree for params: replicated by default; with
    ``tensor_parallel`` the codebook and conv output channels shard over
    the 'model' axis (GSPMD inserts the collectives)."""

    def spec_for(path: str, leaf) -> NamedSharding:
        if tensor_parallel and mesh.shape.get("model", 1) > 1:
            for pattern, dim in _TP_RULES:
                if pattern.search(path):
                    spec = _rule_spec(leaf, dim)
                    if spec is None:
                        continue
                    axis = spec.index("model")
                    # only shard if the target dim divides evenly
                    if leaf.shape[axis] % mesh.shape["model"] == 0:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    path_leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [
        spec_for(jax.tree_util.keystr(path), leaf)
        for path, leaf in path_leaves
    ]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def shard_batch(batch: Any, mesh: Mesh):
    """Place a host batch on the mesh with the batch axis sharded over
    'data'.

    Single-process: one ``device_put`` against the global sharding. With
    multiple processes each host holds its OWN loader shard
    (``loader_shard_args`` rank-strides the dataset), so the local array
    is that host's slice of the global batch, NOT the global value —
    ``make_array_from_process_local_data`` assembles the global array
    from the per-process slices (a plain sharded ``device_put`` would
    treat each host's different batch as the same global array and
    silently drop the rows owned by other hosts' devices)."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )
