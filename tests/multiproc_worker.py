"""Worker for the multi-process DP test (spawned by test_multiprocess_dp).

Joins a 2-process jax.distributed group over the CPU backend, builds the
global data-parallel mesh, assembles a global batch from process-local
shards, and runs one real pipeline train step — the DCN init path the
reference exercises via Lightning's num_nodes (train_utils.py:83-92).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from equiadapt_tpu.parallel import (
        data_parallel_jit,
        init_distributed,
        make_mesh,
        replicate,
        shard_batch,
    )

    count = init_distributed(
        coordinator_address=coordinator,
        num_processes=num_procs,
        process_id=pid,
        expected_processes=num_procs,
    )
    assert count == num_procs, count
    assert jax.process_count() == num_procs

    import jax.numpy as jnp
    import optax

    from equiadapt_tpu.data import synthetic_image_batch
    from equiadapt_tpu.images import (
        EquivariantNetwork,
        GroupEquivariantImageCanonicalization,
    )
    from equiadapt_tpu.models import ResNet18
    from equiadapt_tpu.pipelines import (
        ImageClassifierPipeline,
        create_train_state,
        make_train_step,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=4, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=1,
    )
    canon = GroupEquivariantImageCanonicalization(
        canonicalization_network=net, in_shape=(16, 16, 3), resize_shape=8,
    )
    pipe = ImageClassifierPipeline(
        canonicalizer=canon,
        prediction_network=ResNet18(num_classes=4, small_images=True),
    )
    # raw uint32 key: extended key dtypes don't round-trip through the
    # host-local -> global replication helper
    rng = jax.random.PRNGKey(0)
    global_batch = 8
    local = synthetic_image_batch(
        jax.random.fold_in(rng, pid), global_batch // num_procs,
        size=16, channels=3, num_classes=4,
    )
    state = create_train_state(pipe, rng, local["image"], optax.sgd(1e-3))

    mesh = make_mesh()  # global device list after init
    assert len(mesh.devices.reshape(-1)) == num_procs * jax.local_device_count()
    state = replicate(state, mesh)
    step = data_parallel_jit(
        make_train_step({"task_weight": 1.0, "prior_weight": 1.0,
                         "group_contrast_weight": 0.0,
                         "canonicalization_type": "group_equivariant",
                         "out_vector_size": 128, "artifact_err_wt": 0.0},
                        jit=False),
        mesh, num_extra_args=1,
    )
    batch = shard_batch(local, mesh)  # process-local shard -> global array
    state, metrics = step(state, batch, replicate(rng, mesh))
    loss = float(metrics["loss/total"])
    assert loss == loss, "NaN loss"
    print(f"MULTIPROC_OK pid={pid} procs={count} loss={loss:.4f}", flush=True)


if __name__ == "__main__":
    main()
