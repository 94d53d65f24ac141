"""Group-parallel (orbit-axis) sharding: the |G| orbit as a mesh axis.

The canonicalization workloads carry a parallelism axis the reference never
exploits (it loops over group elements in Python —
examples/images/classification/inference_utils.py:100-122, and over orbit
degrees at discrete_group.py:387-409): the |G| group orbit. SURVEY.md §5
calls this out as the TPU analog of sequence parallelism — "materialize the
orbit as a leading axis and shard it". This module does exactly that:

* `make_mesh_group(n_data, n_group)` builds a 2-D ("data", "group") mesh.
* `group_sharded_inference(...)` runs the per-group-element robustness
  sweep (the reference's GroupInference, |G| full model evaluations) with
  the orbit's leading G axis sharded over "group" and the batch axis over
  "data" — each device evaluates its group element(s) on its batch shard,
  and the only collective is the final metric reduction riding ICI.

The same (G, B) product sharding applies to the optimized canonicalizer's
(G*B)-row orbit batch: pass `orbit_spec()` to a
`jax.lax.with_sharding_constraint` around `materialize_orbit` output when
driving it under an explicit mesh.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jnp.ndarray

__all__ = ["make_mesh_group", "orbit_spec", "group_sharded_inference"]


def make_mesh_group(
    n_data: int, n_group: int, axis_names: Tuple[str, str] = ("data", "group")
) -> Mesh:
    """(n_data, n_group) mesh; "group" indexes orbit elements."""
    devs = jax.devices()
    if len(devs) < n_data * n_group:
        raise ValueError(
            f"mesh {n_data}x{n_group} needs {n_data * n_group} devices, "
            f"have {len(devs)}"
        )
    grid = np.asarray(devs[: n_data * n_group]).reshape(n_data, n_group)
    return Mesh(grid, axis_names)


def orbit_spec(
    group_axis: str = "group", data_axis: str = "data"
) -> P:
    """PartitionSpec for a (G, B, ...) orbit tensor: G over the group axis,
    B over the data axis."""
    return P(group_axis, data_axis)


def group_sharded_inference(
    state: Any,
    batch: Dict[str, Array],
    mesh: Mesh,
    *,
    num_rotations: int = 4,
    group_type: str = "rotation",
    grayscale: bool = False,
    data_axis: str = "data",
    group_axis: str = "group",
) -> Dict[str, Array]:
    """`pipelines.classification.group_inference` with the orbit sharded.

    Semantically identical to the unsharded sweep (tests assert equal
    metrics on the virtual mesh); the |G| model evaluations run
    concurrently across the `group_axis` devices. |G| need not divide the
    axis size — XLA pads the G axis shards.
    """
    from equiadapt_tpu.ops.pallas.orbit import materialize_orbit

    state_sh = NamedSharding(mesh, P())
    batch_sh = NamedSharding(mesh, P(data_axis))
    ospec = NamedSharding(mesh, orbit_spec(group_axis, data_axis))

    def sweep(state, batch):
        x, labels = batch["image"], batch["label"]
        B = x.shape[0]
        mode = "zeros" if grayscale else "border"
        orbit = materialize_orbit(
            x, num_rotations, group_type=group_type, padding_mode=mode,
            sign=1.0,
        )
        G = orbit.shape[0] // B
        orbit = jax.lax.with_sharding_constraint(
            orbit.reshape(G, B, *x.shape[1:]), ospec
        ).reshape(G * B, *x.shape[1:])
        logits, _ = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            orbit,
            training=False,
        )
        pred = jnp.argmax(logits, -1).reshape(G, B)
        accs = jnp.mean((pred == labels[None]).astype(jnp.float32), axis=1)
        out = {f"test/acc_element_{g}": accs[g] for g in range(G)}
        out["test/group_acc"] = jnp.mean(accs)
        out["test/acc"] = accs[0]
        return out

    with mesh:
        fn = jax.jit(sweep, in_shardings=(state_sh, batch_sh))
        return fn(state, batch)
