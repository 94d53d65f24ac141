"""Metric aggregation + CSV/JSONL logging (the wandb-optional observability
layer; reference uses WandbLogger + self.log_dict, SURVEY.md §5).

`MetricLogger` accumulates per-step metric dicts on host, averages per
epoch, and appends JSONL rows — greppable, diffable, no external service.
An EarlyStopping helper mirrors the reference's patience-on-val/acc
(train_utils.py:106-112).
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["MetricLogger", "EarlyStopping", "assert_finite_loss", "save_canonized_images", "gradient_watch"]


class MetricLogger:
    def __init__(self, log_path: Optional[str] = None, use_wandb: bool = False):
        """JSONL-first logger; `use_wandb=True` mirrors flushes to a wandb
        run if the package is importable and a run is active (the
        reference's WandbLogger surface, optional here by design)."""
        self.log_path = log_path
        self._sums: Dict[str, float] = defaultdict(float)
        self._counts: Dict[str, int] = defaultdict(int)
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                if wandb.run is not None:
                    self._wandb = wandb
            except ImportError:
                pass
        if log_path:
            os.makedirs(os.path.dirname(os.path.abspath(log_path)), exist_ok=True)

    def update(self, metrics: Dict[str, Any]) -> None:
        for k, v in metrics.items():
            arr = np.asarray(v)
            if arr.ndim == 0:
                self._sums[k] += float(arr)
                self._counts[k] += 1

    def flush(self, step: int, prefix: str = "") -> Dict[str, float]:
        means = {
            (prefix + k): self._sums[k] / max(self._counts[k], 1) for k in self._sums
        }
        self._sums.clear()
        self._counts.clear()
        if self.log_path:
            with open(self.log_path, "a") as f:
                f.write(json.dumps({"step": step, "time": time.time(), **means}) + "\n")
        if self._wandb is not None:
            self._wandb.log(means, step=step)
        return means


class EarlyStopping:
    """Stop when the monitored metric hasn't improved for `patience` checks."""

    def __init__(self, patience: int = 10, mode: str = "max", min_delta: float = 0.0):
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.bad = 0

    def update(self, value: float) -> bool:
        """Returns True if training should stop."""
        improved = (
            self.best is None
            or (self.mode == "max" and value > self.best + self.min_delta)
            or (self.mode == "min" and value < self.best - self.min_delta)
        )
        if improved:
            self.best = float(value)
            self.bad = 0
        else:
            self.bad += 1
        return self.bad >= self.patience


def assert_finite_loss(metrics) -> None:
    """Host-side NaN guard: crash like the reference's
    `assert not torch.isnan(loss)` (examples/images/classification/
    model.py:125). The jitted steps surface `loss/finite` as a metric so
    they stay side-effect free; call this on the fetched metrics.
    """
    flag = metrics.get("loss/finite")
    if flag is None:
        return
    import numpy as np

    if not bool(np.all(np.asarray(flag) > 0.5)):
        raise FloatingPointError(f"Loss is NaN/Inf: {metrics}")


def save_canonized_images(path: str, originals, canonized, max_images: int = 8) -> str:
    """Write an (original | canonicalized) side-by-side PNG grid.

    Implements checkpoint.save_canonized_images for real: the reference
    declares the flag (configs/checkpoint/default.yaml:3) but never
    consumes it anywhere in its code. Images are min-max normalized per
    panel; NHWC float arrays (grayscale or RGB).
    """
    import numpy as np
    from PIL import Image

    def norm(a):
        a = np.asarray(a, np.float32)
        lo, hi = a.min(), a.max()
        a = (a - lo) / (hi - lo + 1e-8)
        return (a * 255).astype(np.uint8)

    n = min(max_images, np.shape(originals)[0])
    rows = []
    for i in range(n):
        o, c = norm(originals[i]), norm(canonized[i])
        if o.shape[-1] == 1:
            o, c = o[..., 0], c[..., 0]
        rows.append(np.concatenate([o, np.full_like(o[:, :2], 255), c], axis=1))
    grid = np.concatenate(rows, axis=0)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    Image.fromarray(grid).save(path)
    return path


def gradient_watch(grads, max_bins: int = 16) -> Dict[str, Any]:
    """Per-subtree gradient statistics — the `wandb.watch(model, log="all")`
    analog (reference examples/images/classification/train.py:92-97 attaches
    wandb's gradient/parameter histogram hooks).

    Returns a flat dict of `grad/<path>/{norm,absmax}` host floats plus a
    `grad/global_norm` scalar and, per leaf, a fixed-bin log10-|g| histogram
    (as a list, JSONL-friendly; wandb consumers can wrap it in
    `wandb.Histogram`). Call on the grad pytree a train step already
    computes — a pure host-side summary, no extra device work beyond the
    reductions.
    """
    import jax
    import jax.numpy as jnp

    flat = jax.tree_util.tree_flatten_with_path(grads)[0]
    out: Dict[str, Any] = {}
    sq_total = 0.0
    for path, leaf in flat:
        name = "/".join(
            getattr(p, "key", getattr(p, "idx", None)).__str__() for p in path
        )
        a = np.asarray(jnp.abs(leaf.astype(jnp.float32)))
        if a.size == 0:
            continue
        n = float(np.sqrt((a.astype(np.float64) ** 2).sum()))
        sq_total += n * n
        out[f"grad/{name}/norm"] = n
        out[f"grad/{name}/absmax"] = float(a.max())
        # log10 histogram over [1e-12, 1e4): clamped, fixed edges so rows
        # are comparable across steps
        lg = np.log10(np.clip(a[a > 0], 1e-12, 1e4 - 1e-9)) if (a > 0).any() else np.array([])
        hist, _ = np.histogram(lg, bins=max_bins, range=(-12.0, 4.0))
        out[f"grad/{name}/log10_hist"] = hist.tolist()
    out["grad/global_norm"] = float(np.sqrt(sq_total))
    return out
