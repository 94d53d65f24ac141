"""N-body training CLI.

TPU-native analog of reference examples/nbody/train.py:13-115. Dataset is
generated on device by the lax.scan charged-particle simulator
(equiadapt_tpu/data/nbody_sim.py), matching the reference's nbody_small task
(predict frame 40 from frame 30). Note: the reference's test path crashes on
an undefined `image_data` (nbody/train.py:102, a documented wart); the test
mode here evaluates MSE on a held-out simulated split.

    python examples/nbody/train.py prediction.architecture=GNN \
        experiment.num_epochs=5
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from equiadapt_tpu.data import generate_nbody_dataset
from equiadapt_tpu.pipelines import (
    NBodyPipeline,
    create_nbody_state,
    make_nbody_train_step,
)
from equiadapt_tpu.utils import (
    compose_config,
    get_nbody_canonicalizer,
    get_nbody_prediction_network,
)
from equiadapt_tpu.utils.checkpoint import (
    best_metric_saver,
    restore_checkpoint,
    restore_config,
)
from equiadapt_tpu.utils.metrics import MetricLogger


def main(argv) -> None:
    cfg = compose_config(
        argv,
        config_dir=os.path.join(os.path.dirname(os.path.abspath(__file__)), "configs"),
        base=[
            "prediction.architecture=GNN",
        "canonicalization.canonicalization_type=continuous_group",
        "canonicalization.network_hyperparams.canon_feature=pv",
        ],
    )
    if cfg.checkpoint.checkpoint_name and cfg.checkpoint.checkpoint_path:
        cfg = cfg.override(
            "checkpoint.checkpoint_path="
            f"{cfg.checkpoint.checkpoint_path}/{cfg.checkpoint.checkpoint_name}"
        )
    if cfg.experiment.run_mode == "test" and cfg.checkpoint.checkpoint_path:
        # reconstruct the exact canonicalizer from the checkpoint snapshot
        # (the reference's nbody test path crashes instead — see docstring)
        cfg = restore_config(cfg.checkpoint.checkpoint_path).override(
            "experiment.run_mode=test"
        )
    rng = jax.random.key(cfg.experiment.seed)
    nb = cfg.dataset.num_nodes_graph  # particles per graph (no hard-coded 5)
    train = generate_nbody_dataset(jax.random.fold_in(rng, 0), 512, n_balls=nb)
    valid = generate_nbody_dataset(jax.random.fold_in(rng, 1), 128, n_balls=nb)

    canon = get_nbody_canonicalizer(cfg.canonicalization)
    pred = get_nbody_prediction_network(cfg.prediction)
    pipe = NBodyPipeline(canonicalizer=canon, prediction_network=pred)

    tx = optax.adamw(cfg.experiment.learning_rate, weight_decay=cfg.experiment.weight_decay)
    state = create_nbody_state(pipe, rng, train, tx)
    step = make_nbody_train_step()

    @jax.jit
    def eval_mse(state, batch):
        variables = {"params": state.params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        pred_loc = state.apply_fn(
            variables, batch["loc"], batch["vel"], batch["charges"], training=False
        )
        return jnp.mean((pred_loc - batch["loc_end"]) ** 2)

    if cfg.experiment.run_mode == "test":
        state = restore_checkpoint(
            cfg.checkpoint.checkpoint_path, state,
            strict=cfg.checkpoint.strict_loading,
        )
        test = generate_nbody_dataset(jax.random.fold_in(rng, 2), 128, n_balls=nb)
        print({"test/mse": float(eval_mse(state, test))})
        return

    logger = MetricLogger(None)
    saver = (
        best_metric_saver(cfg.checkpoint.checkpoint_path, mode="min")
        if cfg.checkpoint.checkpoint_path
        else None
    )
    bs = cfg.experiment.batch_size
    n = train["loc"].shape[0]
    for epoch in range(cfg.experiment.num_epochs):
        perm = jax.random.permutation(jax.random.fold_in(rng, 100 + epoch), n)
        for i in range(n // bs):
            idx = perm[i * bs : (i + 1) * bs]
            batch = {k: v[idx] for k, v in train.items()}
            state, metrics = step(state, batch, rng)
            logger.update(metrics)
        val = float(eval_mse(state, valid))
        print(f"epoch {epoch}: {logger.flush(epoch)} val/mse={val:.6f}")
        if saver is not None:
            saver.maybe_save(val, state, cfg)


if __name__ == "__main__":
    main(sys.argv[1:])
