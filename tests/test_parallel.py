"""Multi-host entry points (single-process behavior on the 8-device mesh).

True multi-process coverage needs multiple hosts; here we pin down the
single-process contracts: `init_distributed` is a no-op without a
coordinator, and the process-local assembly path
(`jax.make_array_from_process_local_data`) produces arrays identical to the
single-host `shard_batch` device_put under the same NamedSharding — so the
multi-host branch is exercised up to the process boundary.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from equiadapt_tpu.parallel import init_distributed, make_mesh, shard_batch


def test_init_distributed_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert init_distributed() == jax.process_count() == 1


def test_process_local_assembly_matches_device_put():
    mesh = make_mesh(8)
    batch = {
        "image": np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3),
        "label": np.arange(8, dtype=np.int32),
    }
    via_put = shard_batch(batch, mesh)
    sharding = NamedSharding(mesh, P("data"))
    via_local = jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch,
    )
    for k in batch:
        assert via_put[k].sharding.is_equivalent_to(via_local[k].sharding, 4)
        np.testing.assert_array_equal(
            np.asarray(via_put[k]), np.asarray(via_local[k])
        )


def test_sharded_batch_feeds_jit_reduction():
    mesh = make_mesh(8)
    x = np.ones((16, 4), np.float32)
    xs = shard_batch({"x": x}, mesh)["x"]

    @jax.jit
    def f(v):
        return jnp.sum(v)

    assert float(f(xs)) == 64.0


@pytest.mark.slow
def test_multiprocess_dp_two_local_processes(tmp_path):
    """End-to-end DCN init path: two real processes join via
    jax.distributed.initialize (CPU backend), build the global mesh,
    assemble a global batch from per-process shards and take one
    data-parallel train step (VERDICT round-2 item 8; reference
    train_utils.py:83-92 num_nodes)."""
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(repo, "tests", "multiproc_worker.py")
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [_sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-3000:]}"
        assert f"MULTIPROC_OK pid={pid} procs=2" in out, out[-2000:]
