"""Image-classification training CLI.

TPU-native analog of reference examples/images/classification/train.py:13-121
(Hydra entry, wandb, Lightning Trainer) — a plain argparse CLI over the
dataclass config with Hydra-style dotted overrides:

    python examples/images/classification/train.py \
        canonicalization.network_hyperparams.num_rotations=8 \
        experiment.num_epochs=2 dataset.dataset_name=synthetic

Test mode restores the canonicalization config from the checkpoint
(reference train.py:15-33): pass experiment.run_mode=test with
checkpoint.checkpoint_path set.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from equiadapt_tpu.data import synthetic_image_batch
from equiadapt_tpu.parallel import (
    data_parallel_jit,
    init_distributed,
    make_mesh,
    replicate,
    shard_batch,
)
from equiadapt_tpu.pipelines import (
    ImageClassifierPipeline,
    create_train_state,
    group_inference,
    make_eval_step,
    make_optimizer,
    make_train_step,
    vanilla_inference,
)
from equiadapt_tpu.utils import (
    Config,
    compose_config,
    get_image_canonicalization_network,
    get_image_canonicalizer,
    get_image_prediction_network,
)
from equiadapt_tpu.utils.checkpoint import (
    best_metric_saver,
    restore_checkpoint,
    restore_config,
)
from equiadapt_tpu.utils.metrics import (
    EarlyStopping,
    MetricLogger,
    assert_finite_loss,
)


def build_pipeline(cfg: Config) -> ImageClassifierPipeline:
    in_shape = (cfg.dataset.image_size, cfg.dataset.image_size, cfg.dataset.in_channels)
    net = get_image_canonicalization_network(cfg.canonicalization, in_shape)
    canon = get_image_canonicalizer(cfg.canonicalization, net, in_shape)
    pred = get_image_prediction_network(
        cfg.prediction, cfg.dataset.num_classes,
        small_images=cfg.dataset.image_size <= 64,
    )
    return ImageClassifierPipeline(
        canonicalizer=canon, prediction_network=pred,
        remat=cfg.prediction.remat,
    )


def get_batches(cfg: Config, rng, num_batches: int, split: str = "train"):
    """split="train": shuffled + augmented; split="test": the held-out
    split, deterministic, no augmentation (the reference datamodules'
    val/test dataloaders). Synthetic data ignores the split (fresh draws
    per fold)."""
    if cfg.dataset.dataset_name == "synthetic":
        for i in range(num_batches):
            yield synthetic_image_batch(
                jax.random.fold_in(rng, i),
                cfg.experiment.batch_size,
                size=cfg.dataset.image_size,
                channels=cfg.dataset.in_channels,
                num_classes=cfg.dataset.num_classes,
            )
    else:
        from equiadapt_tpu.data.images import get_image_dataset

        yield from get_image_dataset(cfg, rng, num_batches, split=split)


def main(argv) -> None:
    cfg = compose_config(
        argv, config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs")
    )
    if cfg.checkpoint.checkpoint_name and cfg.checkpoint.checkpoint_path:
        # named run directory under checkpoint_path (ModelCheckpoint
        # filename analog, reference train_utils.py:99-105)
        cfg = cfg.override(
            "checkpoint.checkpoint_path="
            f"{cfg.checkpoint.checkpoint_path}/{cfg.checkpoint.checkpoint_name}"
        )
    if cfg.experiment.run_mode == "test" and cfg.checkpoint.checkpoint_path:
        # reconstruct the exact canonicalizer from the checkpoint snapshot
        cfg = restore_config(cfg.checkpoint.checkpoint_path).override(
            "experiment.run_mode=test"
        )
    if cfg.experiment.num_nodes > 1:
        # multi-host DP: join the DCN process group before any backend touch
        # (coordinator/process id from JAX_COORDINATOR_ADDRESS etc.) — the
        # reference's Trainer(num_nodes=...) analog (train_utils.py:83-92)
        init_distributed(expected_processes=cfg.experiment.num_nodes)
    jax.config.update("jax_default_prng_impl", "threefry2x32")
    rng = jax.random.key(cfg.experiment.seed)

    pipeline = build_pipeline(cfg)
    sample = next(get_batches(cfg, rng, 1))
    tx = make_optimizer(
        architecture=cfg.prediction.architecture,
        dataset_name=cfg.dataset.dataset_name,
        learning_rate=cfg.experiment.learning_rate,
        canonicalization_learning_rate=cfg.experiment.canonicalization_learning_rate,
        weight_decay=cfg.experiment.weight_decay,
        freeze_prediction=cfg.prediction.freeze_encoder,
    )
    state = create_train_state(pipeline, rng, sample["image"], tx)
    if cfg.prediction.pretrained:
        if not cfg.prediction.pretrained_path:
            raise ValueError(
                "prediction.pretrained=true needs prediction.pretrained_path "
                "(a local torchvision .pth; no egress to download DEFAULT "
                "weights — see models/convert.py)"
            )
        from equiadapt_tpu.models.convert import apply_pretrained_to_state

        state = apply_pretrained_to_state(
            state, cfg.prediction.architecture, cfg.prediction.pretrained_path
        )
        print(f"loaded pretrained {cfg.prediction.architecture} weights "
              f"from {cfg.prediction.pretrained_path}")

    loss_kwargs = {
        "task_weight": cfg.experiment.loss.task_weight,
        "prior_weight": cfg.experiment.loss.prior_weight,
        "group_contrast_weight": cfg.experiment.loss.group_contrast_weight,
        "canonicalization_type": cfg.canonicalization.canonicalization_type,
        "out_vector_size": cfg.canonicalization.network_hyperparams.out_vector_size,
        "artifact_err_wt": cfg.canonicalization.artifact_err_wt,
    }

    n_dev = min(cfg.experiment.num_devices, jax.device_count())
    mesh = make_mesh(n_dev)
    step = data_parallel_jit(
        make_train_step(
            loss_kwargs, jit=False,
            watch_gradients=cfg.experiment.watch_gradients,
        ),
        mesh, num_extra_args=1,
    )
    state = replicate(state, mesh)
    eval_step = make_eval_step(loss_kwargs)

    if cfg.experiment.run_mode == "test":
        state = restore_checkpoint(
            cfg.checkpoint.checkpoint_path, state,
            strict=cfg.checkpoint.strict_loading,
        )
        batch = next(get_batches(cfg, jax.random.fold_in(rng, 999), 1, split="test"))
        if cfg.experiment.inference_method == "group":
            metrics = group_inference(
                state, batch,
                num_rotations=cfg.experiment.num_group_elements_for_inference,
                grayscale=cfg.dataset.in_channels == 1,
            )
        else:
            metrics = vanilla_inference(state, batch, cfg.dataset.num_classes)
        print({k: float(jnp.mean(v)) for k, v in metrics.items()})
        return

    if cfg.experiment.run_mode == "dryrun":
        # Lightning fast_dev_run analog (reference train_utils.py:78-81):
        # one train step + one eval batch, no checkpointing, then exit
        batch = next(get_batches(cfg, rng, 1))
        state, tm = step(state, shard_batch(batch, mesh), rng)
        vm = eval_step(state, batch)
        print(
            f"dryrun ok: train loss={float(tm['loss/total']):.4f} "
            f"eval loss={float(vm['loss/total']):.4f}"
        )
        return

    if cfg.experiment.run_mode == "auto_tune":
        # TPU-native trainer.tune: LR range test before training
        # (reference train.py:105-106 -> Lightning trainer.tune)
        from equiadapt_tpu.utils.tuner import lr_find

        def _batches():
            e = 0
            while True:
                yield from get_batches(cfg, jax.random.fold_in(rng, 50_000 + e), 10)
                e += 1

        result = lr_find(
            create_state=lambda tx: replicate(
                create_train_state(pipeline, rng, sample["image"], tx), mesh
            ),
            make_step=lambda s: data_parallel_jit(
                make_train_step(loss_kwargs, jit=False), mesh, num_extra_args=1
            ),
            batches=map(lambda b: shard_batch(b, mesh), _batches()),
            rng=rng,
        )
        print(f"auto_tune: suggested learning rate {result.suggestion:.3e}")
        tx = make_optimizer(
            architecture=cfg.prediction.architecture,
            dataset_name=cfg.dataset.dataset_name,
            learning_rate=result.suggestion,
            canonicalization_learning_rate=cfg.experiment.canonicalization_learning_rate,
            weight_decay=cfg.experiment.weight_decay,
            freeze_prediction=cfg.prediction.freeze_encoder,
        )
        state = replicate(
            create_train_state(pipeline, rng, sample["image"], tx), mesh
        )

    logger = MetricLogger(f"{cfg.checkpoint.checkpoint_path}/train_log.jsonl"
                          if cfg.checkpoint.checkpoint_path else None)
    saver = (
        best_metric_saver(cfg.checkpoint.checkpoint_path)
        if cfg.checkpoint.checkpoint_path
        else None
    )
    stopper = EarlyStopping(patience=10)
    resumer = None
    start_epoch = 0
    if cfg.checkpoint.resume and cfg.checkpoint.checkpoint_path:
        # crash-resume: async step-indexed saves + restart-from-latest
        # (Lightning ckpt_path="last" analog; SURVEY §5 failure recovery)
        from equiadapt_tpu.utils.checkpoint import AsyncTrainCheckpointer

        resumer = AsyncTrainCheckpointer(
            cfg.checkpoint.checkpoint_path, config=cfg
        )
        state, latest = resumer.restore_latest(state)
        if latest is not None:
            start_epoch = latest + 1
            print(f"resumed from epoch {latest}")
    steps_per_epoch = 20 if cfg.dataset.dataset_name == "synthetic" else 400
    if cfg.experiment.profile:
        # capture a device trace of the first steps; named scopes label the
        # canonicalize/select/warp/invert stages (utils/profiling.py)
        from equiadapt_tpu.utils.profiling import profile_trace

        with profile_trace(cfg.experiment.profile_dir):
            b = next(get_batches(cfg, jax.random.fold_in(rng, 77), 1))
            for _ in range(3):
                state, m = step(state, shard_batch(b, mesh), rng)
            jax.block_until_ready(m["loss/total"])
        print(f"profile trace written to {cfg.experiment.profile_dir}")
    for epoch in range(start_epoch, cfg.experiment.num_epochs):
        for batch in get_batches(cfg, jax.random.fold_in(rng, epoch), steps_per_epoch):
            state, metrics = step(state, shard_batch(batch, mesh), rng)
            assert_finite_loss(metrics)
            logger.update(metrics)
        val = next(get_batches(cfg, jax.random.fold_in(rng, 10_000 + epoch), 1,
                                split="test"))
        vm = eval_step(state, val)
        if cfg.checkpoint.save_canonized_images and cfg.checkpoint.checkpoint_path:
            from equiadapt_tpu.utils.metrics import save_canonized_images

            variables = {"params": state.params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            x_c, _ = pipeline.apply(
                variables, val["image"][:8], training=False,
                method=pipeline.canonicalize,
            )
            save_canonized_images(
                f"{cfg.checkpoint.checkpoint_path}/canonized_epoch{epoch}.png",
                val["image"][:8], x_c,
            )
        means = logger.flush(epoch, prefix="train/")
        acc = float(vm["metric/acc"])
        print(f"epoch {epoch}: {means} val/acc={acc:.4f}")
        if saver is not None:
            saver.maybe_save(acc, state, cfg)
        if resumer is not None:
            resumer.save(epoch, state)  # async; training continues
        if stopper.update(acc):
            print("early stopping")
            break
    if resumer is not None:
        resumer.close()


if __name__ == "__main__":
    main(sys.argv[1:])
