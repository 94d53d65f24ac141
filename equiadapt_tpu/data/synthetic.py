"""Synthetic datasets for tests and benchmarks (no downloads; zero egress).

The real dataset loaders (data/images.py, data/pointcloud.py) gate on local
files; these generators provide deterministic learnable tasks so the
end-to-end pipelines and benchmarks run hermetically.
"""

from __future__ import annotations

from typing import Dict, Iterator

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["synthetic_image_batch", "synthetic_pointcloud_batch", "batch_iterator"]


def synthetic_image_batch(
    rng: jax.Array, batch: int, size: int = 32, channels: int = 3, num_classes: int = 10
) -> Dict[str, Array]:
    """Class-dependent oriented blobs: learnable by both the canonicalizer
    and the classifier (class controls a dominant spatial frequency)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    labels = jax.random.randint(k1, (batch,), 0, num_classes)
    ys = jnp.linspace(-1, 1, size)
    xs = jnp.linspace(-1, 1, size)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    freq = (labels[:, None, None] + 1).astype(jnp.float32)
    base = jnp.sin(freq * 3.0 * gx[None]) + jnp.cos(freq * 2.0 * gy[None])
    noise = 0.1 * jax.random.normal(k2, (batch, size, size, channels))
    img = base[..., None] + noise
    return {"image": img.astype(jnp.float32), "label": labels}


def synthetic_pointcloud_batch(
    rng: jax.Array, batch: int, num_points: int = 256, num_classes: int = 8
) -> Dict[str, Array]:
    """Class-dependent ellipsoid clouds."""
    k1, k2 = jax.random.split(rng)
    labels = jax.random.randint(k1, (batch,), 0, num_classes)
    pts = jax.random.normal(k2, (batch, num_points, 3))
    scale = jnp.stack(
        [1.0 + labels, jnp.ones_like(labels), 1.0 / (1.0 + labels)], axis=-1
    ).astype(jnp.float32)
    return {"points": pts * scale[:, None, :] * 0.3, "label": labels}


def batch_iterator(rng: jax.Array, gen, num_batches: int, **kw) -> Iterator[Dict[str, Array]]:
    for i in range(num_batches):
        yield gen(jax.random.fold_in(rng, i), **kw)
