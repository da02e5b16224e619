"""Real multi-process distributed training: 2 OS processes connect via
``jax.distributed.initialize`` (localhost coordinator, CPU backend), build
one global 2-device mesh, feed per-host loader shards
(reference rank-sliced-sampler semantics, util.py:374-391), run one
data-parallel train step, and must end with identical parameters.

This is the multi-HOST path (process-id plumbing + DCN-style collectives
over gRPC) that the virtual 8-device single-process mesh tests cannot
cover."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("NSG_JAX_CACHE_DIR", "/tmp/nsg_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    coord = sys.argv[1]
    pid = int(sys.argv[2])
    outdir = sys.argv[3]

    from neural_sound_generation_tpu.parallel import (
        initialize, loader_shard_args, make_mesh, replicated_sharding,
    )

    topo = initialize(coordinator_address=coord, num_processes=2,
                      process_id=pid)
    assert topo.process_count == 2, topo
    assert topo.process_index == pid
    assert topo.global_device_count == 2, topo
    shard = loader_shard_args()
    assert shard == {"num_hosts": 2, "host_id": pid}, shard

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_sound_generation_tpu.config import Config
    from neural_sound_generation_tpu.data.sampler import shard_for_host
    from neural_sound_generation_tpu.models import VQVAE
    from neural_sound_generation_tpu.training import (
        create_train_state, make_train_step,
    )

    # global batch of 8 utterance crops; each host loads ONLY its
    # rank-strided slice (the DistributedBucketingSampler semantics)
    rng = np.random.default_rng(0)
    full = rng.standard_normal((8, 16, 16, 1)).astype(np.float32) * 0.1
    mine = shard_for_host(range(8), **shard)
    local = full[np.asarray(mine)]

    mesh = make_mesh(n_data=2, n_model=1)  # spans both processes
    cfg = Config()
    model = VQVAE(input_dim=1, dim=8, z_dim=16)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(local),
                           train=False)
    state = create_train_state(variables, cfg.train)
    rep = replicated_sharding(mesh)
    state = jax.device_put(state, rep)

    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local
    )
    step = make_train_step(model, cfg, donate=False)
    key = jax.device_put(jax.random.PRNGKey(0), rep)
    with mesh:
        state, metrics = step(state, {"x": x}, key)
    loss = float(metrics["loss"])
    assert np.isfinite(loss)

    # params must be bit-identical on both hosts after the all-reduced
    # gradient step; dump the codebook for the parent to compare
    cb = np.asarray(jax.device_get(state.params["codebook"]))
    np.save(os.path.join(outdir, f"codebook_{pid}.npy"), cb)
    print(f"worker {pid}: loss={loss:.6f} ok", flush=True)
    """
)


_PP_WORKER = textwrap.dedent(
    """
    import os, sys
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("NSG_JAX_CACHE_DIR", "/tmp/nsg_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    coord = sys.argv[1]
    pid = int(sys.argv[2])
    outdir = sys.argv[3]

    from neural_sound_generation_tpu.parallel import initialize

    topo = initialize(coordinator_address=coord, num_processes=2,
                      process_id=pid)
    # 4 virtual devices per process (XLA_FLAGS in the parent env)
    assert topo.global_device_count == 8, topo
    assert jax.local_device_count() == 4

    import numpy as np
    import jax.numpy as jnp
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_mesh, make_pp_prior_train_step,
        pp_opt_state_from_dense, pp_opt_state_to_dense,
        pp_prior_partition, pp_prior_split, pp_prior_unpartition,
    )
    from neural_sound_generation_tpu.training import checkpoint

    # ('data', 'pipe') = (2, 4): global device order groups by process,
    # so the reshape puts process p's 4 local devices in data-row p —
    # the 'data' axis crosses the DCN (gRPC) boundary, the 'pipe' ring
    # stays process-local (the ICI-local/DCN-data layout the scaling
    # recipe prescribes)
    mesh = make_pp_mesh(n_pipe=4, n_data=2)
    row = {d.process_index for d in np.asarray(mesh.devices)[pid]}
    assert row == {pid}, (pid, row)

    model = TransformerPrior(input_dim=32, dim=16, n_layers=4, n_heads=2,
                             n_classes=4, max_rows=8, max_cols=8)
    rng = np.random.default_rng(0)
    codes_full = rng.integers(0, 32, size=(4, 4, 6)).astype(np.int32)
    labels_full = (np.arange(4) % 4).astype(np.int32)

    # restore the checkpoint the SINGLE-process parent wrote (pp2 run):
    # params AND Adam moments cross the process-count boundary dense
    host_vars = jax.tree_util.tree_map(
        np.asarray,
        model.init(jax.random.PRNGKey(0),
                   jnp.asarray(codes_full[:2]),
                   jnp.asarray(labels_full[:2])),
    )
    tx = optax.adam(1e-3)
    template = {
        "params": host_vars["params"],
        "opt": tx.init(host_vars["params"]),
    }
    restored, extra = checkpoint.restore(
        os.path.join(outdir, "ckpt_in"), template
    )
    assert int(restored["opt"][0].count) == 1  # parent stepped once

    rest, stacked = pp_prior_partition(
        model, {"params": restored["params"]}, mesh
    )
    opt_state = pp_opt_state_from_dense(
        restored["opt"], lambda d: pp_prior_split(model, d), mesh
    )
    init_fn, step = make_pp_prior_train_step(model, mesh, n_micro=2, tx=tx)

    # global batch sharded over the DCN 'data' axis: each process feeds
    # its half (microbatch axis is data-sharded inside the staged loop)
    def dev_batch(arr, spec):
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), arr[pid * 2:(pid + 1) * 2]
        )

    batch = {
        "codes": dev_batch(codes_full, P("data")),
        "labels": dev_batch(labels_full, P("data")),
    }
    rest, stacked, opt_state, m = step(rest, stacked, opt_state, batch)
    loss = float(m["loss"])
    assert np.isfinite(loss)

    # pipe shards are replicated over 'data', so each process holds a
    # complete copy across its local devices: device_get works per-host
    dense_p = pp_prior_unpartition(model, rest, stacked)
    dense_o = pp_opt_state_to_dense(
        opt_state, lambda r, s: pp_prior_unpartition(model, r, s)
    )
    assert int(dense_o[0].count) == 2
    np.save(os.path.join(outdir, f"qkv0_{pid}.npy"),
            np.asarray(dense_p["block_0"]["attn_qkv"]["kernel"]))
    # EVERY process calls save — exactly what the production train
    # loops do — because orbax coordinates multihost saves across
    # processes (a single-process save deadlocks in the barrier; the
    # primary host writes the data)
    checkpoint.save(
        os.path.join(outdir, "ckpt_out"),
        {"params": jax.tree_util.tree_map(np.asarray, dense_p),
         "opt": jax.tree_util.tree_map(np.asarray, dense_o)},
        step=2,
    )
    print(f"worker {pid}: loss={loss:.6f} ok", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_dcn_dp_x_pp_cross_process_restore(tmp_path):
    """Round-5 multi-host hardening: 2 OS processes x 4 virtual CPU
    devices with a dp2(DCN) x pp4(process-local) mesh — DCN data
    parallelism COMPOSED with in-process pipeline parallelism — plus the
    checkpoint lifecycle across process counts: a single-process pp2 run
    writes params+moments, the 2-process dp2xpp4 run restores and trains
    on, writes back, and the single process restores that and steps
    again. The reference only sketched rank-sharding semantics
    (util.py:353-391); this is the full multi-host story."""
    import optax

    import jax as _jax

    from neural_sound_generation_tpu.models import TransformerPrior
    from neural_sound_generation_tpu.parallel.pipeline import (
        make_pp_mesh, make_pp_prior_train_step,
        pp_opt_state_from_dense, pp_opt_state_to_dense,
        pp_prior_partition, pp_prior_split, pp_prior_unpartition,
    )
    from neural_sound_generation_tpu.training import checkpoint

    import jax.numpy as jnp

    # ---- phase 1 (single process, the parent's 8 virtual devices):
    # train one pp2 step and write the dense checkpoint the workers
    # will restore (1 -> 2 process direction)
    model = TransformerPrior(input_dim=32, dim=16, n_layers=4, n_heads=2,
                             n_classes=4, max_rows=8, max_cols=8)
    rng = np.random.default_rng(0)
    codes_full = rng.integers(0, 32, size=(4, 4, 6)).astype(np.int32)
    labels_full = (np.arange(4) % 4).astype(np.int32)
    host_vars = _jax.tree_util.tree_map(
        np.asarray,
        model.init(_jax.random.PRNGKey(0), jnp.asarray(codes_full[:2]),
                   jnp.asarray(labels_full[:2])),
    )
    tx = optax.adam(1e-3)
    mesh2 = make_pp_mesh(2)
    rest, stacked = pp_prior_partition(model, host_vars, mesh2)
    init_fn, step2 = make_pp_prior_train_step(model, mesh2, n_micro=2, tx=tx)
    opt = init_fn(rest, stacked)
    rest, stacked, opt, m = step2(
        rest, stacked, opt,
        {"codes": jnp.asarray(codes_full), "labels": jnp.asarray(labels_full)},
    )
    assert np.isfinite(float(m["loss"]))
    unpart = lambda r, s: pp_prior_unpartition(model, r, s)  # noqa: E731
    checkpoint.save(
        str(tmp_path / "ckpt_in"),
        {"params": _jax.tree_util.tree_map(np.asarray, unpart(rest, stacked)),
         "opt": _jax.tree_util.tree_map(
             np.asarray, pp_opt_state_to_dense(opt, unpart))},
        step=1,
    )

    # ---- phase 2: the 2-process dp2 x pp4 run restores it, steps, and
    # writes ckpt_out
    worker = tmp_path / "pp_worker.py"
    worker.write_text(_PP_WORKER, encoding="utf-8")
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )

    def launch():
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coord, str(pid), str(tmp_path)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            for pid in range(2)
        ]
        return [p.communicate(timeout=300)[0] for p in procs], procs

    for attempt in range(3):
        outs, procs = launch()
        if all(p.returncode == 0 for p in procs):
            break
        stolen = any(
            "in use" in out.lower() or "bind" in out.lower() for out in outs
        )
        if not stolen or attempt == 2:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pp worker {pid} failed:\n{out}"
        assert f"worker {pid}:" in out and "ok" in out

    # DCN all-reduce left both processes with identical updated weights
    q0 = np.load(tmp_path / "qkv0_0.npy")
    q1 = np.load(tmp_path / "qkv0_1.npy")
    np.testing.assert_array_equal(q0, q1)

    # ---- phase 3 (2 -> 1 process direction): restore the 2-process
    # run's checkpoint into this single process and keep training
    template = {
        "params": host_vars["params"],
        "opt": tx.init(host_vars["params"]),
    }
    restored, _ = checkpoint.restore(str(tmp_path / "ckpt_out"), template)
    assert int(restored["opt"][0].count) == 2
    r3, s3 = pp_prior_partition(model, {"params": restored["params"]}, mesh2)
    o3 = pp_opt_state_from_dense(
        restored["opt"], lambda d: pp_prior_split(model, d), mesh2
    )
    # the restored params match what the workers computed
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["block_0"]["attn_qkv"]["kernel"]), q0
    )
    _, _, _, m3 = step2(
        r3, s3, o3,
        {"codes": jnp.asarray(codes_full), "labels": jnp.asarray(labels_full)},
    )
    assert np.isfinite(float(m3["loss"]))


@pytest.mark.slow
def test_two_process_data_parallel_step(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER, encoding="utf-8")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # 1 CPU device per process
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep
        + env.get("PYTHONPATH", "")
    )

    def launch():
        # bind-then-close port pick is inherently TOCTOU-racy on a shared
        # host; the retry below covers a stolen port
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        coord = f"localhost:{port}"
        procs = [
            subprocess.Popen(
                [sys.executable, str(worker), coord, str(pid), str(tmp_path)],
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
                env=env,
            )
            for pid in range(2)
        ]
        return [p.communicate(timeout=300)[0] for p in procs], procs

    for attempt in range(3):
        outs, procs = launch()
        if all(p.returncode == 0 for p in procs):
            break
        stolen = any(
            "in use" in out.lower() or "bind" in out.lower() for out in outs
        )
        if not stolen or attempt == 2:
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"worker {pid}:" in out and "ok" in out

    cb0 = np.load(tmp_path / "codebook_0.npy")
    cb1 = np.load(tmp_path / "codebook_1.npy")
    np.testing.assert_array_equal(cb0, cb1)
