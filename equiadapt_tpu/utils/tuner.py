"""Auto-tuning: learning-rate range finder (the reference's
`experiment.run_mode=auto_tune` -> Lightning `trainer.tune`,
examples/images/classification/train.py:105-106).

Lightning's LR finder ramps the learning rate exponentially over a short
run, records the loss curve, and suggests the LR at the steepest descent of
the smoothed curve. Same algorithm here, TPU-style: the ramp is an optax
schedule inside ONE jitted train step (no per-step recompiles), losses are
fetched per step (tiny transfers), and the suggestion is computed host-side.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterator

import jax
import numpy as np
import optax

__all__ = ["lr_find", "LRFindResult"]


class LRFindResult:
    """Loss-vs-LR curve + suggestion (Lightning LRFinder interface shape)."""

    def __init__(self, lrs: np.ndarray, losses: np.ndarray, suggestion: float):
        self.lrs = lrs
        self.losses = losses
        self.suggestion = suggestion

    def __repr__(self) -> str:  # pragma: no cover - cosmetic
        return f"LRFindResult(suggestion={self.suggestion:.3e}, steps={len(self.lrs)})"


def _suggest(lrs: np.ndarray, losses: np.ndarray, smooth: float = 0.7) -> float:
    """Steepest-descent point of the EMA-smoothed loss curve, excluding the
    divergence tail (loss > 4x running min), matching Lightning's heuristic."""
    ema = np.zeros_like(losses)
    run = 0.0
    for i, v in enumerate(losses):
        run = smooth * run + (1 - smooth) * v
        ema[i] = run / (1 - smooth ** (i + 1))  # bias-corrected from zero init
    run_min = np.minimum.accumulate(ema)
    valid = ema <= 4.0 * run_min + 1e-12
    last = int(np.argmin(valid)) if (~valid).any() else len(ema)
    ema, lrs_v = ema[: max(last, 3)], lrs[: max(last, 3)]
    grads = np.gradient(ema, np.log(lrs_v))
    return float(lrs_v[int(np.argmin(grads))])


def lr_find(
    create_state: Callable[[optax.GradientTransformation], Any],
    make_step: Callable[[Any], Callable],
    batches: Iterator[Dict[str, Any]],
    rng: jax.Array,
    min_lr: float = 1e-6,
    max_lr: float = 1.0,
    num_steps: int = 60,
    optimizer: Callable[..., optax.GradientTransformation] = optax.adamw,
) -> LRFindResult:
    """Exponential LR range test.

    Args:
        create_state: tx -> TrainState (e.g. partial(create_train_state,
            pipeline, rng, sample_images)).
        make_step: state-agnostic train-step factory; called once (the LR
            ramp lives in the optax schedule, so one jitted step serves the
            whole sweep).
        batches: iterator of training batches (cycled host-side).
        num_steps: ramp length (Lightning default 100; 60 keeps it cheap).

    Returns:
        LRFindResult with the per-step (lr, loss) curve and the suggestion.
    """
    ramp = optax.exponential_decay(
        init_value=min_lr,
        transition_steps=1,
        decay_rate=(max_lr / min_lr) ** (1.0 / max(num_steps - 1, 1)),
    )
    state = create_state(optimizer(learning_rate=ramp))
    step_fn = make_step(state)
    lrs, losses = [], []
    for i in range(num_steps):
        batch = next(batches)
        state, metrics = step_fn(state, batch, rng)
        loss = float(metrics["loss/total"] if "loss/total" in metrics
                     else metrics["loss/task"])
        lrs.append(float(ramp(i)))
        losses.append(loss)
        if not np.isfinite(loss):
            break
    lrs_a, losses_a = np.asarray(lrs), np.asarray(losses)
    finite = np.isfinite(losses_a)
    return LRFindResult(
        lrs_a[finite], losses_a[finite], _suggest(lrs_a[finite], losses_a[finite])
    )
