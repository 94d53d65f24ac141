"""Orbax checkpointing with embedded config snapshot.

TPU-native equivalent of the reference's Lightning ModelCheckpoint +
save_hyperparameters flow (examples/images/classification/
train_utils.py:97-114; train.py:15-33 restores the canonicalization config
from the checkpoint in test mode). Here the `Config` dict is stored next to
the train state, so `restore_config` can rebuild the exact canonicalizer for
evaluation, and the prediction/canonicalizer parameter subtrees can be
loaded independently (the reference's two-checkpoint transfer flow,
train_utils.py:46-58).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from equiadapt_tpu.utils.config import Config

__all__ = [
    "save_checkpoint",
    "restore_checkpoint",
    "restore_config",
    "load_prediction_params_from",
    "best_metric_saver",
    "AsyncTrainCheckpointer",
]


def _config_path(path: str) -> str:
    return os.path.join(path, "config.json")


def save_checkpoint(path: str, state: Any, config: Optional[Config] = None) -> None:
    """Save a train-state pytree (+ config snapshot) to `path`."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.join(path, "state"),
        {"params": state.params, "batch_stats": state.batch_stats,
         "opt_state": state.opt_state, "step": state.step},
        force=True,
    )
    ckptr.wait_until_finished()
    if config is not None:
        with open(_config_path(path), "w") as f:
            json.dump(config.to_dict(), f, indent=2)


def restore_checkpoint(path: str, state: Any, strict: bool = True) -> Any:
    """Restore into an abstract/concrete state template (same treedef).

    strict=False (the reference's `strict_loading` knob,
    train_utils.py:35-42): leaves missing from the checkpoint or with a
    different shape keep the template's values instead of erroring — the
    partial-finetune / surgery loading mode.
    """
    import jax
    import numpy as np

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "batch_stats": state.batch_stats,
              "opt_state": state.opt_state, "step": state.step}
    if strict:
        restored = ckptr.restore(os.path.join(path, "state"), target)
    else:
        # Lightning's strict=False covers the module state_dict only:
        # merge params/batch_stats leaf-wise, keep the template's
        # optimizer state and step untouched.
        raw = ckptr.restore(os.path.join(path, "state"))  # no template

        def merge(tpl, donor):
            if isinstance(tpl, dict):
                if not isinstance(donor, dict):
                    return tpl
                return {
                    k: merge(v, donor[k]) if k in donor else v
                    for k, v in tpl.items()
                }
            try:
                if donor is None or np.shape(donor) != np.shape(tpl):
                    return tpl
            except ValueError:
                return tpl
            return jax.numpy.asarray(donor, dtype=np.asarray(tpl).dtype)

        restored = {
            "params": merge(target["params"], raw.get("params", {})),
            "batch_stats": merge(
                target["batch_stats"], raw.get("batch_stats", {})
            ),
            "opt_state": target["opt_state"],
            "step": target["step"],
        }
    return state.replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=restored["step"],
    )


def restore_config(path: str) -> Config:
    """Rebuild the Config stored with a checkpoint (test-mode restore,
    reference train.py:15-33)."""
    with open(_config_path(os.path.abspath(path))) as f:
        return Config.from_dict(json.load(f))


def load_prediction_params_from(path: str, state: Any, subtree: str = "prediction_network") -> Any:
    """Replace only the prediction-network params from another checkpoint
    (the reference's finetuned-prediction transfer, train_utils.py:46-58).

    The donor checkpoint is restored WITHOUT a target template, so its
    canonicalizer/optimizer may differ arbitrarily from the current state —
    only the prediction subtree must match, which is exactly the transfer
    scenario this exists for. Shapes are validated leaf-by-leaf.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(os.path.join(path, "state"))  # raw tree
    donor = restored["params"][subtree]
    ours = state.params[subtree]
    donor_shapes = jax.tree_util.tree_map(lambda a: np.shape(a), donor)
    our_shapes = jax.tree_util.tree_map(lambda a: np.shape(a), ours)
    if donor_shapes != our_shapes:
        raise ValueError(
            f"prediction subtree '{subtree}' shape mismatch between donor "
            f"checkpoint and current state:\n{donor_shapes}\nvs\n{our_shapes}"
        )
    donor = jax.tree_util.tree_map(
        lambda d, o: jnp.asarray(d, dtype=o.dtype), donor, ours
    )
    new_params = dict(state.params)
    new_params[subtree] = donor
    return state.replace(params=type(state.params)(new_params))


class AsyncTrainCheckpointer:
    """Step-indexed async checkpointing with restart-from-latest.

    SURVEY.md §5 failure-recovery surface: saves happen in a background
    thread (training continues while the previous step serializes — Orbax
    CheckpointManager with async enabled), old steps are garbage-collected
    to `max_to_keep`, and `restore_latest` resumes an interrupted run from
    the newest complete step (Lightning's crash-resume analog; the config
    snapshot travels with the directory like `save_checkpoint`).
    """

    def __init__(self, path: str, max_to_keep: int = 3,
                 config: Optional[Config] = None):
        self.path = os.path.abspath(path)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, enable_async_checkpointing=True
        )
        self._mgr = ocp.CheckpointManager(
            os.path.join(self.path, "steps"), options=options
        )
        if config is not None:
            os.makedirs(self.path, exist_ok=True)
            with open(_config_path(self.path), "w") as f:
                json.dump(config.to_dict(), f, indent=2)

    @staticmethod
    def _tree(state: Any) -> dict:
        return {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state, "step": state.step}

    def save(self, step: int, state: Any) -> None:
        """Enqueue an async save of `state` at `step` (returns immediately)."""
        self._mgr.save(int(step), args=ocp.args.StandardSave(self._tree(state)))

    def restore_latest(self, state: Any) -> tuple[Any, Optional[int]]:
        """(state, step) from the newest complete checkpoint, or
        (state, None) if the directory holds none — call at startup to make
        every run restartable."""
        latest = self._mgr.latest_step()
        if latest is None:
            return state, None
        restored = self._mgr.restore(
            latest, args=ocp.args.StandardRestore(self._tree(state))
        )
        return (
            state.replace(
                params=restored["params"], batch_stats=restored["batch_stats"],
                opt_state=restored["opt_state"], step=restored["step"],
            ),
            latest,
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.wait_until_finished()
        self._mgr.close()


class best_metric_saver:
    """Keep-best checkpointing on a monitored metric
    (ModelCheckpoint(monitor='val/acc', mode='max') analog)."""

    def __init__(self, path: str, mode: str = "max"):
        self.path = path
        self.mode = mode
        self.best: Optional[float] = None

    def maybe_save(self, metric: float, state: Any, config: Optional[Config] = None) -> bool:
        better = (
            self.best is None
            or (self.mode == "max" and metric > self.best)
            or (self.mode == "min" and metric < self.best)
        )
        if better:
            self.best = float(metric)
            save_checkpoint(self.path, state, config)
        return better
