"""Multi-host entry points (single-process behavior on the 8-device mesh).

True multi-process coverage needs multiple hosts; here we pin down the
single-process contracts: `init_distributed` is a no-op without a
coordinator, and the process-local assembly path
(`jax.make_array_from_process_local_data`) produces arrays identical to the
single-host `shard_batch` device_put under the same NamedSharding — so the
multi-host branch is exercised up to the process boundary.
"""

import jax
import jax.numpy as jnp
import numpy as np
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
