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
