"""Batch-serving entry point: AOT-compiled bf16-fast canonicalized inference.

Production-serving counterpart of the training CLI (no reference analog —
the torch reference has no serving path). Loads a checkpoint (or fresh
params), builds the pipeline in the serving configuration
(warp_mode="fast", bfloat16 compute), AOT-compiles the forward for one
fixed batch shape with `jit(...).lower(...).compile()` so the first request
pays no trace/compile latency, then streams batches and reports
throughput.

    python examples/images/classification/serve.py \
        checkpoint.checkpoint_path=./ckpt experiment.batch_size=256 \
        dataset.image_size=224

Dotted overrides as in train.py; with no checkpoint it serves fresh
(randomly initialized) weights — useful for capacity planning.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp

from equiadapt_tpu.data import synthetic_image_batch
from equiadapt_tpu.pipelines import ImageClassifierPipeline
from equiadapt_tpu.utils import (
    Config,
    compose_config,
    get_image_canonicalization_network,
    get_image_canonicalizer,
    get_image_prediction_network,
)
from equiadapt_tpu.utils.checkpoint import restore_checkpoint, restore_config


def build_serving_pipeline(cfg: Config) -> ImageClassifierPipeline:
    """Pipeline in the serving configuration: fast warps + bf16 compute."""
    cfg = cfg.override(
        "canonicalization.warp_mode=fast",
        "canonicalization.compute_dtype=bfloat16",
        "prediction.dtype=bfloat16",
    )
    in_shape = (cfg.dataset.image_size, cfg.dataset.image_size,
                cfg.dataset.in_channels)
    net = get_image_canonicalization_network(cfg.canonicalization, in_shape)
    canon = get_image_canonicalizer(cfg.canonicalization, net, in_shape)
    pred = get_image_prediction_network(
        cfg.prediction, cfg.dataset.num_classes,
        small_images=cfg.dataset.image_size <= 64,
    )
    return ImageClassifierPipeline(canonicalizer=canon, prediction_network=pred)


def compile_forward(pipeline, variables, batch_shape):
    """AOT-compile the serving forward for one fixed batch shape."""

    def forward(variables, x):
        logits, info = pipeline.apply(variables, x, training=False)
        return logits, info.element.rotation_deg

    x_spec = jax.ShapeDtypeStruct(batch_shape, jnp.float32)
    lowered = jax.jit(forward).lower(variables, x_spec)
    return lowered.compile()


def main(argv) -> None:
    # --export=PATH: also write the AOT graph as a self-contained StableHLO
    # artifact (params baked in) for the serving fleet — utils/export.py
    export_path = None
    argv = list(argv)
    for a in list(argv):
        if a.startswith("--export="):
            export_path = a.split("=", 1)[1]
            argv.remove(a)
    cfg = compose_config(
        argv, config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")
    )
    # restore only when the user explicitly pointed at a checkpoint (the
    # config default "./checkpoints" must not silently pick up stray dirs)
    explicit_ckpt = any(a.startswith("checkpoint.checkpoint_path=") for a in argv)
    if explicit_ckpt:
        try:
            cfg = compose_config(
                argv,
                config_dir=os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), "configs"
                ),
                start=restore_config(cfg.checkpoint.checkpoint_path),
            )
        except FileNotFoundError:
            pass
    pipeline = build_serving_pipeline(cfg)

    B = cfg.experiment.batch_size
    shape = (B, cfg.dataset.image_size, cfg.dataset.image_size,
             cfg.dataset.in_channels)
    rng = jax.random.key(cfg.experiment.seed)
    sample = synthetic_image_batch(rng, B, size=cfg.dataset.image_size,
                                   channels=cfg.dataset.in_channels,
                                   num_classes=cfg.dataset.num_classes)
    variables = jax.jit(pipeline.init, static_argnames="training")(
        rng, sample["image"], training=False
    )
    if explicit_ckpt:
        try:
            from equiadapt_tpu.pipelines import create_train_state
            import optax

            state = create_train_state(pipeline, rng, sample["image"],
                                       optax.sgd(0.0))
            # strict=False: merge params/batch_stats only and keep the
            # template opt_state — the checkpoint was written by train.py
            # with its real (labeled chain) optimizer, whose opt_state tree
            # never matches this serving-only sgd(0.0) placeholder.
            state = restore_checkpoint(cfg.checkpoint.checkpoint_path, state,
                                       strict=False)
            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            print("serving checkpoint weights")
        except FileNotFoundError:
            print("no checkpoint found; serving fresh weights")

    t0 = time.perf_counter()
    fwd = compile_forward(pipeline, variables, shape)
    print(f"AOT compile: {time.perf_counter() - t0:.1f}s "
          f"(batch {B} @ {cfg.dataset.image_size}px)")

    if export_path:
        from equiadapt_tpu.utils.export import export_apply

        blob = export_apply(
            lambda v, x: pipeline.apply(v, x, training=False)[0],
            variables, sample["image"],
        )
        with open(export_path, "wb") as f:
            f.write(blob)
        print(f"exported StableHLO artifact: {export_path} ({len(blob)} bytes)")

    n_batches, n_imgs = 0, 0
    t0 = time.perf_counter()
    for i in range(5):
        batch = synthetic_image_batch(jax.random.fold_in(rng, i), B,
                                      size=cfg.dataset.image_size,
                                      channels=cfg.dataset.in_channels,
                                      num_classes=cfg.dataset.num_classes)
        logits, _deg = fwd(variables, batch["image"])
        logits.block_until_ready()
        n_batches += 1
        n_imgs += B
    # force completion (enqueue-ack caveat, docs/benchmarking.md)
    float(logits.astype(jnp.float32).sum())
    dt = time.perf_counter() - t0
    print(f"served {n_batches} batches: {n_imgs / dt:.1f} images/s")


if __name__ == "__main__":
    main(sys.argv[1:])
