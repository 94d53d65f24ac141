"""Device-mesh utilities: data-parallel training over ICI.

The reference's only distribution is Lightning DDP
(examples/images/classification/train_utils.py:68-94 — NCCL all-reduce under
the hood, untested in its CI). The TPU-native equivalent (SURVEY.md §5):
one `jax.jit` over a 1-D "data" mesh with `NamedSharding`; XLA inserts the
gradient all-reduce (psum) over ICI. Multi-host extends the same mesh via
`jax.distributed.initialize` — no code changes to the step function.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_jit",
]


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a host batch on the mesh, sharded along the leading axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def data_parallel_jit(
    step_fn,
    mesh: Mesh,
    axis_name: str = "data",
    donate_state: bool = True,
    num_extra_args: int = 0,
):
    """Jit a (state, batch, *extra) step for data parallelism on `mesh`.

    State (and any extra args, e.g. a PRNG key) are replicated, the batch is
    sharded along its leading axis; XLA's SPMD partitioner inserts the psum
    for the gradient reduction. This is the full extent of the reference's
    parallelism (DDP), done the TPU way. Batch-mean losses/metrics reduce
    correctly across shards under SPMD.
    """
    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(axis_name))
    in_sh = (state_sh, batch_sh) + (state_sh,) * num_extra_args
    return jax.jit(
        step_fn,
        in_shardings=in_sh,
        out_shardings=(state_sh, state_sh),
        donate_argnums=(0,) if donate_state else (),
    )
