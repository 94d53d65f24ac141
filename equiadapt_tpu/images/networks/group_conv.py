"""Discrete-group equivariant convolutions (C_n / D_n GCNN layers), NHWC.

TPU-native rebuild of the reference's custom group-equivariant layers
(reference: equiadapt/images/canonicalization_networks/
custom_group_equivariant_layers.py:9,114,229,364). Differences by design:

* NHWC / HWIO layouts; the whole |G| filter bank is materialized with one
  tiny tap-matrix einsum (the angle table is a trace-time constant, so
  filter rotation is a precomputed linear map — no dynamic gathers; see
  `_rotation_tap_matrix`) and the convolution is a single
  `lax.conv_general_dilated` over C*|G| channels — XLA tiles it onto the MXU.
  No per-element Python loops, no `device="cuda"` construction-time pinning
  (a reference wart, custom_group_equivariant_layers.py:30).
* Fiber permutation indices for the group-group convs are host-side numpy
  constants baked into the trace (static shapes, gather-free weight
  transform via `jnp.take` on a constant index array).
* Output fiber layout is C-major/G-minor: channel index = c * |G| + g,
  matching ops/group_action.py's invert roll.

Group math (dihedral D_n, elements {r_k} ∪ {m r_k}):
  transformed filter for output element u is w'_u(h) = π(u)[w](u^{-1} h);
  for u = r_j:   u^{-1} r_k = r_{k-j},  u^{-1}(m r_k) = m r_{k+j}
  for u = m r_j: u^{-1} r_k = m r_{k+j}, u^{-1}(m r_k) = r_{k-j}
  with π(r_j) = spatial rotation by theta_j and pi(m r_j) = rotation then
  hflip — reproducing the reference's four-block permutation structure
  (custom_group_equivariant_layers.py:420-459) from first principles.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

import functools

Array = jnp.ndarray

__all__ = [
    "RotationEquivariantConvLift",
    "RotoReflectionEquivariantConvLift",
    "RotationEquivariantConv",
    "RotoReflectionEquivariantConv",
]


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    """torch kaiming_uniform_(a=sqrt(5)) on conv weights: U(+-1/sqrt(fan_in)).

    fan_in = prod(shape[:-1]) for HWIO-style layouts used here.
    """
    fan_in = int(np.prod(shape[:-1]))
    bound = 1.0 / np.sqrt(fan_in)
    import jax.random as jr

    return jr.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def _conv2d(x: Array, w: Array, stride: int, padding: int) -> Array:
    """NHWC x HWIO conv with integer symmetric padding."""
    return lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=[(padding, padding), (padding, padding)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _fold_avg_pool(bank: Array) -> Array:
    """Fold a trailing 2x2/stride-2 average pool into a conv filter bank.

    avg_pool2x2s2(conv_K(x, w)) == conv_{K+1,stride 2}(x, w') with
    w'[u, v] = (1/4) * sum_{da,db in {0,1}} w[u-da, v-db] (zero outside
    [0, K)): the pooled output is the mean of four adjacent conv outputs,
    and summation over the pooling window commutes with the conv's tap sum.
    Exactness of the lift's rot90 equivariance is inherited from the
    pool-after-conv factorization (both factors commute with rot90 on
    even-size grids — see EquivariantNetwork.pool_after_lift notes).

    Args:
        bank: (K, K, I, O) HWIO filters.

    Returns:
        (K+1, K+1, I, O) filters for a stride-2 conv with the same padding.
    """
    p00 = jnp.pad(bank, ((0, 1), (0, 1), (0, 0), (0, 0)))
    p10 = jnp.pad(bank, ((1, 0), (0, 1), (0, 0), (0, 0)))
    p01 = jnp.pad(bank, ((0, 1), (1, 0), (0, 0), (0, 0)))
    p11 = jnp.pad(bank, ((1, 0), (1, 0), (0, 0), (0, 0)))
    return 0.25 * (p00 + p10 + p01 + p11)


@functools.lru_cache(maxsize=64)
def _rotation_tap_matrix(K: int, angles: tuple) -> np.ndarray:
    """(G, K*K, K*K) fp32 tap matrices: T[g] @ vec(w) == vec(rotate(w, g)).

    Filter rotation with a *constant* angle table is a fixed linear map per
    group element (kornia `rotate` semantics, zeros fill), so the taps are
    precomputed on host and the whole bank transform becomes one tiny
    einsum. The per-element dynamic-angle `rotate` this replaces lowered
    its 4-tap gather to serialized XLA while-loops costing ~0.24 ms per
    canonicalize step at C8 — pure weight-prep overhead (round-4 device-op
    attribution, docs/benchmarking.md). Exact 90-degree multiples snap to
    exact permutation taps (the fp32 cos(pi/2) epsilon of the dynamic path
    leaked ~1e-8 of each filter into neighbor taps; the snap makes rot90
    filter equivariance exact).
    """
    import math

    G = len(angles)
    c = (K - 1) / 2.0
    gy, gx = np.meshgrid(
        np.arange(K, dtype=np.float64), np.arange(K, dtype=np.float64),
        indexing="ij",
    )
    dst = (gy.astype(np.int64) * K + gx.astype(np.int64)).ravel()
    T = np.zeros((G, K * K, K * K), np.float32)
    for g, ang in enumerate(angles):
        ang = float(ang) % 360.0
        k90 = ang / 90.0
        if abs(k90 - round(k90)) < 1e-9:
            rad = math.radians(90.0 * round(k90))
            a, b = round(math.cos(rad)), round(math.sin(rad))
        else:
            rad = math.radians(ang)
            a, b = math.cos(rad), math.sin(rad)
        sx = a * (gx - c) - b * (gy - c) + c
        sy = b * (gx - c) + a * (gy - c) + c
        x0 = np.floor(sx)
        y0 = np.floor(sy)
        fx = sx - x0
        fy = sy - y0
        for ddx, ddy, w in (
            (0, 0, (1 - fx) * (1 - fy)),
            (1, 0, fx * (1 - fy)),
            (0, 1, (1 - fx) * fy),
            (1, 1, fx * fy),
        ):
            xi = x0 + ddx
            yi = y0 + ddy
            valid = (xi >= 0) & (xi <= K - 1) & (yi >= 0) & (yi <= K - 1)
            xc = np.clip(xi, 0, K - 1).astype(np.int64)
            yc = np.clip(yi, 0, K - 1).astype(np.int64)
            np.add.at(
                T[g], (dst, (yc * K + xc).ravel()),
                (w * valid).ravel().astype(np.float32),
            )
    return T


def _rotate_bank(w_img: Array, angles: tuple) -> Array:
    """Rotate a filter bank by per-element *static* angles.

    Args:
        w_img: (K, K, F) shared filters, or (G, K, K, F) per-element
            filters (each rotated by its own angle).
        angles: length-G tuple of degrees (host constants).

    Returns:
        (G, K, K, F) rotated filters (bilinear taps, zeros fill, kornia
        semantics — exact permutations for 90-degree multiples).
    """
    G = len(angles)
    K = w_img.shape[-3]
    T = jnp.asarray(_rotation_tap_matrix(K, tuple(float(a) for a in angles)))
    T = T.astype(w_img.dtype)
    if w_img.ndim == 3:
        F = w_img.shape[-1]
        out = jnp.einsum("gpq,qf->gpf", T, w_img.reshape(K * K, F))
    else:
        F = w_img.shape[-1]
        out = jnp.einsum("gpq,gqf->gpf", T, w_img.reshape(G, K * K, F))
    return out.reshape(G, K, K, F)


def _angle_tuple(num_rotations: int) -> tuple:
    """Host mirror of `group_angles` (same fp32 linspace values)."""
    return tuple(
        float(a)
        for a in np.linspace(
            0.0, 360.0, num_rotations + 1, dtype=np.float32
        )[:num_rotations]
    )


class RotationEquivariantConvLift(nn.Module):
    """Lifting conv: scalar input -> C_n regular-rep feature map.

    Output (B, H', W', out_channels * num_rotations), fiber C-major/G-minor.
    Reference: custom_group_equivariant_layers.py:9-111.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    num_rotations: int = 4
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Any] = None  # computation dtype; None follows the input's
    # fold a 2x2/s2 average pool into the filters (serving-mode energy
    # downsampling without materializing the full-resolution lift output)
    fused_pool: bool = False

    @nn.compact
    def __call__(self, x: Array) -> Array:
        K, Ci, Co, G = self.kernel_size, self.in_channels, self.out_channels, self.num_rotations
        w = self.param("weights", _kaiming_uniform, (K, K, Ci, Co))
        bank = _rotate_bank(w.reshape(K, K, Ci * Co), _angle_tuple(G))  # (G,K,K,Ci*Co)
        # -> HWIO with out channel index c*G + g
        bank = bank.reshape(G, K, K, Ci, Co).transpose(1, 2, 3, 4, 0).reshape(K, K, Ci, Co * G)
        stride = self.stride
        if self.fused_pool:
            assert self.stride == 1, "fused_pool composes with stride-1 convs"
            bank = _fold_avg_pool(bank)
            stride = 2
        dt = self.dtype or x.dtype
        x, bank = x.astype(dt), bank.astype(dt)
        y = _conv2d(x, bank, stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (Co,))
            y = y + jnp.repeat(b.astype(y.dtype), G)[None, None, None, :]
        return y


class RotoReflectionEquivariantConvLift(nn.Module):
    """Lifting conv: scalar input -> D_n regular-rep feature map.

    Fiber order: [r_0..r_{n-1}, m r_0..m r_{n-1}] (rotations then
    reflections), matching the reference's concatenation
    (custom_group_equivariant_layers.py:169-199).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    num_rotations: int = 4
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Any] = None  # computation dtype; None follows the input's
    fused_pool: bool = False  # see RotationEquivariantConvLift

    @nn.compact
    def __call__(self, x: Array) -> Array:
        K, Ci, Co, n = self.kernel_size, self.in_channels, self.out_channels, self.num_rotations
        G = 2 * n
        w = self.param("weights", _kaiming_uniform, (K, K, Ci, Co))
        rot = _rotate_bank(w.reshape(K, K, Ci * Co), _angle_tuple(n))  # (n,K,K,Ci*Co)
        ref = rot[:, :, ::-1, :]  # hflip on the width axis
        bank = jnp.concatenate([rot, ref], axis=0)  # (G,K,K,Ci*Co)
        bank = bank.reshape(G, K, K, Ci, Co).transpose(1, 2, 3, 4, 0).reshape(K, K, Ci, Co * G)
        stride = self.stride
        if self.fused_pool:
            assert self.stride == 1, "fused_pool composes with stride-1 convs"
            bank = _fold_avg_pool(bank)
            stride = 2
        dt = self.dtype or x.dtype
        x, bank = x.astype(dt), bank.astype(dt)
        y = _conv2d(x, bank, stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (Co,))
            y = y + jnp.repeat(b.astype(y.dtype), G)[None, None, None, :]
        return y


def _rotation_perm_indices(n: int) -> np.ndarray:
    """(n, n) index table: out element j reads input fiber (k - j) mod n."""
    k = np.arange(n)[None, :]
    j = np.arange(n)[:, None]
    return (k - j) % n


def _dihedral_perm_indices(n: int) -> np.ndarray:
    """(2n, 2n) fiber gather table for D_n (see module docstring derivation)."""
    fwd = _rotation_perm_indices(n)  # (k - j) % n
    inv = (np.arange(n)[None, :] + np.arange(n)[:, None]) % n  # (k + j) % n
    upper = np.concatenate([fwd, inv + n], axis=1)  # rotation outputs
    lower = np.concatenate([inv + n, fwd], axis=1)  # reflection outputs
    return np.concatenate([upper, lower], axis=0)


class RotationEquivariantConv(nn.Module):
    """Group-to-group conv on C_n regular-rep feature maps.

    Input/output (B, H, W, C * n) with C-major/G-minor fiber.
    Reference: custom_group_equivariant_layers.py:229-361.
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    num_rotations: int = 4
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Any] = None  # computation dtype; None follows the input's

    @nn.compact
    def __call__(self, x: Array) -> Array:
        K, Ci, Co, n = self.kernel_size, self.in_channels, self.out_channels, self.num_rotations
        w = self.param("weights", _kaiming_uniform, (K, K, Ci, n, Co))
        perm = jnp.asarray(_rotation_perm_indices(n))  # (n_out, n_in)
        # permuted[j] = w[..., (k-j)%n, :] then rotate by theta_j
        wp = jnp.take(w, perm, axis=3)  # (K,K,Ci,n_out,n_in,Co)
        wp = wp.transpose(3, 0, 1, 2, 4, 5).reshape(n, K, K, Ci * n * Co)
        bank = _rotate_bank(wp, _angle_tuple(n))
        # (n_out,K,K,Ci,n_in,Co) -> HWIO (K,K,Ci*n_in, Co*n_out)
        bank = bank.reshape(n, K, K, Ci, n, Co).transpose(1, 2, 3, 4, 5, 0)
        bank = bank.reshape(K, K, Ci * n, Co * n)
        dt = self.dtype or x.dtype
        x, bank = x.astype(dt), bank.astype(dt)
        y = _conv2d(x, bank, self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (Co,))
            y = y + jnp.repeat(b.astype(y.dtype), n)[None, None, None, :]
        return y


class RotoReflectionEquivariantConv(nn.Module):
    """Group-to-group conv on D_n regular-rep feature maps.

    Reference: custom_group_equivariant_layers.py:364-538; the fiber gather
    table is derived from the dihedral composition law (module docstring).
    """

    in_channels: int
    out_channels: int
    kernel_size: int
    num_rotations: int = 4
    stride: int = 1
    padding: int = 0
    use_bias: bool = True
    dtype: Optional[Any] = None  # computation dtype; None follows the input's

    @nn.compact
    def __call__(self, x: Array) -> Array:
        K, Ci, Co, n = self.kernel_size, self.in_channels, self.out_channels, self.num_rotations
        G = 2 * n
        w = self.param("weights", _kaiming_uniform, (K, K, Ci, G, Co))
        perm = jnp.asarray(_dihedral_perm_indices(n))  # (G_out, G_in)
        wp = jnp.take(w, perm, axis=3)  # (K,K,Ci,G_out,G_in,Co)
        wp = wp.transpose(3, 0, 1, 2, 4, 5).reshape(G, K, K, Ci * G * Co)
        bank = _rotate_bank(wp, _angle_tuple(n) + _angle_tuple(n))
        # hflip the filters of the reflection outputs
        bank = jnp.concatenate([bank[:n], bank[n:, :, ::-1, :]], axis=0)
        bank = bank.reshape(G, K, K, Ci, G, Co).transpose(1, 2, 3, 4, 5, 0)
        bank = bank.reshape(K, K, Ci * G, Co * G)
        dt = self.dtype or x.dtype
        x, bank = x.astype(dt), bank.astype(dt)
        y = _conv2d(x, bank, self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (Co,))
            y = y + jnp.repeat(b.astype(y.dtype), G)[None, None, None, :]
        return y
