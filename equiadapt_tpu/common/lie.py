"""Lie-group parameterizations (SO(n), O(n), SE(n), E(n)) as pure JAX functions.

TPU-native equivalent of the reference `LieParameterization`
(reference: equiadapt/common/utils.py:54-222). The reference is a
`torch.nn.Module` with no parameters; here it is a lightweight dataclass of
pure functions so it composes with `jit`/`vmap`/`grad` without module
ceremony. Matrix exponentials use `jax.scipy.linalg.expm` (Padé), computed in
fp32 — these are tiny (n<=4) per-sample matrices, so they live on the VPU and
cost nothing next to the network FLOPs.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def son_bases(n: int) -> np.ndarray:
    """Skew-symmetric basis of the so(n) Lie algebra.

    Returns (n*(n-1)/2, n, n) with basis[k][i, j] = 1, basis[k][j, i] = -1 for
    each i < j in lexicographic order (reference common/utils.py:72-90).
    Host-side constant: np array, closed over by jitted functions.
    """
    num = n * (n - 1) // 2
    bases = np.zeros((num, n, n), dtype=np.float32)
    k = 0
    for i in range(n):
        for j in range(i + 1, n):
            bases[k, i, j] = 1.0
            bases[k, j, i] = -1.0
            k += 1
    return bases


@partial(jax.jit, static_argnames="n")
def son_rep(params: Array, n: int) -> Array:
    """SO(n) representation via exp of an so(n) algebra element.

    Args:
        params: (B, n*(n-1)/2) algebra coordinates.
        n: group dimension.

    Returns:
        (B, n, n) rotation matrices. Matches reference get_son_rep
        (common/utils.py:92-104): einsum over bases then matrix_exp.
    """
    bases = jnp.asarray(son_bases(n))
    A = jnp.einsum("bs,sij->bij", params, bases)
    return jax.vmap(jax.scipy.linalg.expm)(A)


def on_rep(params: Array, reflect_indicators: Array, n: int) -> Array:
    """O(n) representation: SO(n) rotation times an optional reflection.

    The reflection convention matches the reference (common/utils.py:106-133):
    diag(1, ..., 1, -1) blended by `reflect_indicators` and *right*-multiplied
    onto the rotation.

    Args:
        params: (B, n*(n-1)/2).
        reflect_indicators: (B, 1) in [0, 1].
        n: group dimension.
    """
    rot = son_rep(params, n)
    refl = jnp.diag(jnp.array([1.0] * (n - 1) + [-1.0], dtype=rot.dtype))
    eye = jnp.eye(n, dtype=rot.dtype)
    mix = reflect_indicators[..., None] * refl + (1.0 - reflect_indicators[..., None]) * eye
    return jnp.matmul(rot, mix)


def sen_rep(params: Array, n: int) -> Array:
    """SE(n) homogeneous representation: (B, n+1, n+1).

    First n*(n-1)/2 params are rotation coordinates, the remaining n are the
    translation (reference common/utils.py:135-157).
    """
    k = n * (n - 1) // 2
    rot = son_rep(params[:, :k], n)
    b = params.shape[0]
    out = jnp.zeros((b, n + 1, n + 1), dtype=params.dtype)
    out = out.at[:, :n, :n].set(rot)
    out = out.at[:, :n, n].set(params[:, k : k + n])
    out = out.at[:, n, n].set(1.0)
    return out


def en_rep(params: Array, reflect_indicators: Array, n: int) -> Array:
    """E(n) homogeneous representation: rotoreflection + translation.

    Reference common/utils.py:159-196.
    """
    k = n * (n - 1) // 2
    rr = on_rep(params[:, :k], reflect_indicators, n)
    b = params.shape[0]
    out = jnp.zeros((b, n + 1, n + 1), dtype=params.dtype)
    out = out.at[:, :n, :n].set(rr)
    out = out.at[:, :n, n].set(params[:, k : k + n])
    out = out.at[:, n, n].set(1.0)
    return out


@dataclasses.dataclass(frozen=True)
class LieParameterization:
    """Dispatch wrapper mirroring the reference class API.

    group_type in {"SOn", "SEn", "On", "En"}; group_dim = n.
    Reference: equiadapt/common/utils.py:54-222 (`get_group_rep`).
    """

    group_type: str
    group_dim: int

    @property
    def num_rot_params(self) -> int:
        return self.group_dim * (self.group_dim - 1) // 2

    def get_group_rep(self, params: Array) -> Array:
        n = self.group_dim
        if self.group_type == "SOn":
            return son_rep(params, n)
        if self.group_type == "SEn":
            return sen_rep(params, n)
        if self.group_type == "On":
            return on_rep(params, jnp.zeros((params.shape[0], 1), params.dtype), n)
        if self.group_type == "En":
            return en_rep(params, jnp.zeros((params.shape[0], 1), params.dtype), n)
        raise ValueError(f"Unsupported group type: {self.group_type}")
