"""Batched group/frame math used across all canonicalizers.

TPU-native reimplementation of the reference's frame-estimation math
(reference: equiadapt/common/utils.py:22-51 `gram_schmidt` and
equiadapt/nbody/canonicalization/euclidean_group.py:139-157
`modified_gram_schmidt`). Pure functions on arrays, safe under `jit`/`vmap`.

The two orthogonalization variants are kept deliberately distinct because the
reference uses *classical* Gram-Schmidt for point clouds (projections of the
raw third vector onto u1 and u2) and *modified* Gram-Schmidt for n-body
(sequential re-projection), and the two differ in fp32 for ill-conditioned
frames. Matching each domain's variant is required for functional parity.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

_EPS = 1e-12


def _unit(v: Array) -> Array:
    """Normalize along the last axis (no epsilon, matching torch.norm division)."""
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def gram_schmidt(vectors: Array) -> Array:
    """Classical Gram-Schmidt for a batch of three 3-vectors.

    Args:
        vectors: (..., 3, 3) — batch of three row vectors to orthonormalize.

    Returns:
        (..., 3, 3) orthonormal frames, rows are the orthonormal vectors.

    Matches reference equiadapt/common/utils.py:22-51: v3 is orthogonalized
    against u1 and u2 using the *raw* third vector's projections (classical GS).
    """
    v1 = _unit(vectors[..., 0, :])
    v2 = vectors[..., 1, :] - jnp.sum(vectors[..., 1, :] * v1, axis=-1, keepdims=True) * v1
    v2 = _unit(v2)
    v3 = (
        vectors[..., 2, :]
        - jnp.sum(vectors[..., 2, :] * v1, axis=-1, keepdims=True) * v1
        - jnp.sum(vectors[..., 2, :] * v2, axis=-1, keepdims=True) * v2
    )
    v3 = _unit(v3)
    return jnp.stack([v1, v2, v3], axis=-2)


def modified_gram_schmidt(vectors: Array) -> Array:
    """Modified Gram-Schmidt for a batch of three 3-vectors.

    Matches reference equiadapt/nbody/canonicalization/euclidean_group.py:139-157:
    v3 is first orthogonalized against v1, then the *result* is orthogonalized
    against v2 (sequential re-projection).

    Args:
        vectors: (..., 3, 3).

    Returns:
        (..., 3, 3) orthonormal frames.
    """
    v1 = _unit(vectors[..., 0, :])
    v2 = vectors[..., 1, :] - jnp.sum(vectors[..., 1, :] * v1, axis=-1, keepdims=True) * v1
    v2 = _unit(v2)
    v3 = vectors[..., 2, :] - jnp.sum(vectors[..., 2, :] * v1, axis=-1, keepdims=True) * v1
    v3 = v3 - jnp.sum(v3 * v2, axis=-1, keepdims=True) * v2
    v3 = _unit(v3)
    return jnp.stack([v1, v2, v3], axis=-2)


def gram_schmidt_2d(vectors: Array) -> Array:
    """Gram-Schmidt for a batch of two 2-vectors (O(2) frames for images).

    Used by the roto-reflection continuous image canonicalizer
    (reference: equiadapt/images/canonicalization/continuous_group.py:128-149).

    Args:
        vectors: (..., 2, 2) — two row vectors per batch element.

    Returns:
        (..., 2, 2) orthonormal frames (possibly with determinant -1).
    """
    v1 = _unit(vectors[..., 0, :])
    v2 = vectors[..., 1, :] - jnp.sum(vectors[..., 1, :] * v1, axis=-1, keepdims=True) * v1
    v2 = _unit(v2)
    return jnp.stack([v1, v2], axis=-2)


def rotmat_2d_from_vector(v: Array) -> Array:
    """Build a 2x2 rotation matrix from a (possibly unnormalized) 2-vector.

    Matches reference continuous_group.py:264-277: first row is the normalized
    vector, second row is its 90-degree companion (-y, x).

    Args:
        v: (..., 2).

    Returns:
        (..., 2, 2) rotation matrices with rows [v_hat, perp(v_hat)].
    """
    v1 = _unit(v)
    v2 = jnp.stack([-v1[..., 1], v1[..., 0]], axis=-1)
    return jnp.stack([v1, v2], axis=-2)


def det_2x2(m: Array) -> Array:
    """Determinant of a batch of 2x2 matrices, (...,2,2) -> (...)."""
    return m[..., 0, 0] * m[..., 1, 1] - m[..., 0, 1] * m[..., 1, 0]
