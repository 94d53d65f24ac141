"""Device-mesh utilities: data-parallel training over ICI.

The reference's only distribution is Lightning DDP
(examples/images/classification/train_utils.py:68-94 — NCCL all-reduce under
the hood, untested in its CI). The TPU-native equivalent (SURVEY.md §5):
one `jax.jit` over a 1-D "data" mesh with `NamedSharding`; XLA inserts the
gradient all-reduce (psum) over ICI. Multi-host extends the same mesh via
`jax.distributed.initialize` — no code changes to the step function.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "init_distributed",
    "make_mesh",
    "shard_batch",
    "replicate",
    "data_parallel_jit",
]


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    expected_processes: Optional[int] = None,
) -> int:
    """Join a multi-host run (the reference's `num_nodes` DDP analog,
    train_utils.py:83-92) — DCN process group + the global device view.

    Arguments fall back to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). When
    none are set but multi-host is *explicitly requested* via
    `expected_processes > 1` (train.py's `experiment.num_nodes`),
    `jax.distributed.initialize()` is called with no arguments so a TPU
    pod's automatic metadata detection runs — otherwise each host would
    silently proceed as an independent single-process run. Only when
    neither arguments nor an explicit multi-host request are present is
    this a no-op (plain single-host runs). Must be called before any
    backend touch. Returns `jax.process_count()` after initialization and
    raises if it does not match `expected_processes`.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    multihost_requested = expected_processes is not None and expected_processes > 1
    if coordinator_address is None and num_processes is None:
        if not multihost_requested:
            return jax.process_count()  # single host, nothing to join
        # explicit multi-host request with no manual coordinator config:
        # let JAX's cluster auto-detection (TPU pod metadata, SLURM, ...)
        # establish the process group.
        jax.distributed.initialize()
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    count = jax.process_count()
    if expected_processes is not None and count != expected_processes:
        raise RuntimeError(
            f"multi-host init produced {count} processes but the run was "
            f"configured for {expected_processes} (experiment.num_nodes) — "
            "refusing to continue as a divergent partial job"
        )
    return count


def make_mesh(num_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices.

    In multi-host runs `jax.devices()` is the *global* device list (after
    `init_distributed`), so the same call builds the cross-host mesh."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def shard_batch(batch: Any, mesh: Mesh, axis_name: str = "data") -> Any:
    """Place a batch on the mesh, sharded along the leading axis.

    Single-host: a plain sharded device_put. Multi-host: each process passes
    its *local* shard of the batch (local_batch = global_batch /
    process_count) and the global array is assembled from per-process data —
    the jax analog of DDP's per-rank loaders (reference
    train_utils.py:83-92 + Lightning's DistributedSampler).
    """
    sharding = NamedSharding(mesh, P(axis_name))
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)
            ),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params / train state) across the mesh.

    Multi-process: `device_put` cannot target non-addressable devices, so
    the global replicated arrays are assembled from the per-process copies
    (every process must hold the same values — true for states built from
    the same seed)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, P()
        )
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
