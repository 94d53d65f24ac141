"""StableHLO export of serving functions (deployment artifact path).

The reference has no deployment story beyond checkpoints; a TPU-native
framework should hand its serving graph to the runtime fleet as a
self-contained artifact. `jax.export` lowers a jitted function to
versioned StableHLO that runs on any machine with a matching XLA runtime —
no Python model code, params baked in as constants.

Typical flow (examples/images/classification/serve.py wires this behind
`--export`):

    blob = export_apply(
        lambda v, x: model.apply(v, x, training=False),
        variables, sample_batch,
    )
    pathlib.Path("model.stablehlo").write_bytes(blob)
    # ... on the serving fleet:
    fn = load_exported(blob)
    logits = fn(batch)

Exports are lowered for BOTH "tpu" and "cpu" by default, so the same
artifact smoke-tests on a CPU host before hitting the fleet. Batch size is
fixed by `sample` (static shapes are the TPU-serving contract everywhere
else in this package; symbolic batch via `jax.export.symbolic_shape` is
possible but deliberately not the default).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

__all__ = ["export_apply", "export_sharded_apply", "load_exported"]


def export_apply(
    apply_fn: Callable[..., Any],
    variables: Any,
    sample: Any,
    *,
    platforms: Sequence[str] = ("tpu", "cpu"),
    symbolic_batch: bool = False,
) -> bytes:
    """Serialize `apply_fn(variables, sample)` to a StableHLO artifact.

    Args:
        apply_fn: pure function of (variables, batch) — e.g.
            ``lambda v, x: model.apply(v, x, training=False)`` or a wrapped
            canonicalize+predict closure.
        variables: parameter pytree, baked into the artifact as constants
            (the artifact is self-contained; re-export after finetuning).
        sample: example batch fixing input shapes/dtypes.
        platforms: lowering targets; the default ships one artifact that
            runs on the TPU fleet and smoke-tests on CPU.
        symbolic_batch: trace the leading axis of every `sample` leaf as a
            symbolic dimension ``b`` (shape polymorphism), so one artifact
            serves any batch size. Every leaf must carry the batch on
            axis 0. Paths that hand-tile on the batch (the pallas select
            kernels used by ``warp_mode="fast"``) need concrete grids;
            their dispatchers detect the symbolic batch and fall back to
            the XLA blend formulations (bit-compatible at 90-degree
            elements, two-pass numerics otherwise — the same fallback
            non-TPU backends use), so fast-mode serving closures export
            polymorphically too. Export at fixed batch when the pallas
            kernels themselves must be in the artifact.

    Returns:
        Serialized bytes (StableHLO + calling-convention metadata).
    """

    def fn(batch):
        return apply_fn(variables, batch)

    args = sample
    if symbolic_batch:
        (b,) = jax.export.symbolic_shape("b")

        def poly(leaf):
            leaf = jnp.asarray(leaf)
            if leaf.ndim == 0:
                raise ValueError(
                    "symbolic_batch needs every sample leaf to carry the "
                    f"batch on axis 0; got a scalar leaf {leaf!r}"
                )
            return jax.ShapeDtypeStruct((b, *leaf.shape[1:]), leaf.dtype)

        args = jax.tree_util.tree_map(poly, sample)

    exported = jax.export.export(jax.jit(fn), platforms=tuple(platforms))(args)
    return bytes(exported.serialize())  # serialize() returns a bytearray


def export_sharded_apply(
    apply_fn: Callable[..., Any],
    variables: Any,
    sample: Any,
    mesh: "jax.sharding.Mesh",
    *,
    axis_name: str = "data",
    platforms: Sequence[str] = ("tpu", "cpu"),
) -> bytes:
    """Serialize a data-parallel serving function over `mesh` (SPMD artifact).

    The exported module carries the sharding annotations: the batch is
    split along its leading axis over `axis_name`, params are baked in as
    replicated constants, and XLA partitions the module exactly as the live
    `jit` would (collectives ride ICI). Loading requires a runtime with the
    same device count (`jax.export` records `nr_devices`); call it with a
    batch placed via `parallel.shard_batch`.

    Reference analog: none — the reference's only deployment unit is a
    single-process checkpoint (SURVEY §5); this ships the multi-chip
    serving graph itself.
    """
    from jax.sharding import NamedSharding, PartitionSpec

    batch_sh = NamedSharding(mesh, PartitionSpec(axis_name))
    repl = NamedSharding(mesh, PartitionSpec())
    variables = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, repl), variables
    )

    def fn(batch):
        return apply_fn(variables, batch)

    def spec(leaf):
        leaf = jnp.asarray(leaf)
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=batch_sh)

    args = jax.tree_util.tree_map(spec, sample)
    exported = jax.export.export(jax.jit(fn), platforms=tuple(platforms))(args)
    return bytes(exported.serialize())


def load_exported(data: bytes) -> Callable[..., Any]:
    """Deserialize an `export_apply` artifact into a callable.

    The callable runs under the current default backend (it must be one of
    the artifact's lowering platforms) and accepts the same batch
    shapes/dtypes the export was traced with.
    """
    exported = jax.export.deserialize(bytearray(data))

    def fn(batch):
        return exported.call(batch)

    return fn
