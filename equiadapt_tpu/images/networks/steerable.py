"""SO(2)-steerable CNN built from circular-harmonic filter bases.

Replaces the reference's e2cnn machinery (ESCNNSteerableNetwork,
reference escnn_networks.py:120-224: Rot2dOnR2(N=-1) gspace, FourierELU
activations, output FieldType = 2 x irrep(1)) — e2cnn has no JAX analog, so
this is a from-scratch minimal steerable stack (SURVEY.md §7 step 5).

Theory: a feature field of rotation order m transforms under input rotation
by angle t as  f_m(x) -> e^{i m t} f_m(R_{-t} x).  A conv kernel mapping
order m_in to order m_out is equivariant iff it has the form
W(r, phi) = rho(r) e^{i (m_out - m_in) phi}.  We expand rho in Gaussian
radial rings and learn one complex coefficient per (out-field, in-field,
ring). The full real-valued HWIO kernel is assembled with one einsum from a
host-precomputed basis stack and applied as a single XLA conv — so a
steerable layer costs exactly one dense convolution on the MXU.

Nonlinearity: norm-ReLU, z -> relu(|z| + b) * z/|z| (phase-preserving, hence
equivariant) for m != 0; plain gelu for m = 0 fields. Norm batch
normalization divides each field by the running RMS of its norm (the
GNormBatchNorm analog).

Complex fields are stored as channel pairs (re, im); an order-0 field is one
real channel. Exact 90-degree rotations commute with grid sampling of the
analytic basis, so the equivariance tests are exact at 90 degrees and
approximate elsewhere — same regime as the reference's N=16 Fourier
sampling.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np
from jax import lax

Array = jnp.ndarray

__all__ = ["SteerableConv", "NormNonlinearity", "NormBatchNorm", "SteerableNetwork"]


def _field_channels(orders: Sequence[int]) -> int:
    return sum(1 if m == 0 else 2 for m in orders)


def _harmonic_basis(kernel_size: int, dm: int) -> np.ndarray:
    """Basis stack for angular order difference dm.

    Returns (num_rings, K, K, 2): [cos(dm*phi), sin(dm*phi)] * ring_j(r),
    L2-normalized per ring. Rings at integer radii 0..K//2 with sigma 0.6;
    the r=0 ring is excluded for dm != 0 (undefined phase).
    """
    K = kernel_size
    c = (K - 1) / 2.0
    ys, xs = np.mgrid[0:K, 0:K].astype(np.float64)
    x = xs - c
    y = ys - c
    r = np.sqrt(x * x + y * y)
    # y points *down* in image coordinates; use the math-convention angle
    # (-y up) so the irrep-1 output vectors co-rotate with the kornia-angle
    # image rotation used by the canonicalizer warp.
    phi = np.arctan2(-y, x)
    sigma = 0.6
    max_r = K // 2
    rings = []
    start = 0 if dm == 0 else 1
    for j in range(start, max_r + 1):
        radial = np.exp(-((r - j) ** 2) / (2 * sigma**2))
        radial[r > max_r + 0.5] = 0.0
        if dm != 0:
            # the r=0 sample has no defined phase; any nonzero value there
            # breaks rotation equivariance exactly at the center pixel
            radial[r == 0.0] = 0.0
        re = radial * np.cos(dm * phi)
        im = radial * np.sin(dm * phi)
        norm = np.sqrt((re**2 + im**2).sum()) + 1e-12
        rings.append(np.stack([re / norm, im / norm], axis=-1))
    return np.asarray(rings, dtype=np.float32)  # (J, K, K, 2)


class SteerableConv(nn.Module):
    """Equivariant conv between collections of SO(2) fields.

    in_orders / out_orders: rotation order of each input/output field.
    One learnable complex coefficient per (out_field, in_field, ring);
    kernel assembled via einsum from the precomputed harmonic basis.
    """

    in_orders: Tuple[int, ...]
    out_orders: Tuple[int, ...]
    kernel_size: int
    stride: int = 1
    padding: int = 0

    @nn.compact
    def __call__(self, x: Array) -> Array:
        K = self.kernel_size
        Cin = _field_channels(self.in_orders)
        Cout = _field_channels(self.out_orders)
        # assemble the real HWIO kernel block by block
        blocks = {}
        for dm in {mo - mi for mo in self.out_orders for mi in self.in_orders} | {
            mo + mi for mo in self.out_orders for mi in self.in_orders
        }:
            blocks[dm] = jnp.asarray(_harmonic_basis(K, dm))

        kernel = jnp.zeros((K, K, Cin, Cout), dtype=jnp.float32)
        ci = 0
        for fi, mi in enumerate(self.in_orders):
            co = 0
            wi = 1 if mi == 0 else 2
            for fo, mo in enumerate(self.out_orders):
                wo = 1 if mo == 0 else 2
                dm = mo - mi
                basis = blocks[dm]  # (J, K, K, 2): cos/sin of dm*phi
                J = basis.shape[0]
                coef = self.param(
                    f"w_{fo}_{fi}",
                    nn.initializers.normal(stddev=1.0 / math.sqrt(J * max(1, len(self.in_orders)))),
                    (J, 2),  # complex coefficient (re, im) per ring
                )
                # complex kernel k = sum_j (a_j + i b_j) * e^{i dm phi} ring_j
                k_re = jnp.einsum("j,jhw->hw", coef[:, 0], basis[..., 0]) - jnp.einsum(
                    "j,jhw->hw", coef[:, 1], basis[..., 1]
                )
                k_im = jnp.einsum("j,jhw->hw", coef[:, 0], basis[..., 1]) + jnp.einsum(
                    "j,jhw->hw", coef[:, 1], basis[..., 0]
                )
                if mi == 0 and mo == 0:
                    kernel = kernel.at[:, :, ci, co].add(k_re)
                elif mi == 0 and mo != 0:
                    # out = k * f (complex kernel times real input)
                    kernel = kernel.at[:, :, ci, co].add(k_re)
                    kernel = kernel.at[:, :, ci, co + 1].add(k_im)
                elif mi != 0 and mo == 0:
                    # real part of k * f: re = k_re f_re - k_im f_im
                    kernel = kernel.at[:, :, ci, co].add(k_re)
                    kernel = kernel.at[:, :, ci + 1, co].add(-k_im)
                else:
                    # complex product: (k f): re = k_re f_re - k_im f_im
                    #                        im = k_re f_im + k_im f_re
                    kernel = kernel.at[:, :, ci, co].add(k_re)
                    kernel = kernel.at[:, :, ci + 1, co].add(-k_im)
                    kernel = kernel.at[:, :, ci, co + 1].add(k_im)
                    kernel = kernel.at[:, :, ci + 1, co + 1].add(k_re)
                co += wo
            ci += wi

        return lax.conv_general_dilated(
            x,
            kernel.astype(x.dtype),  # follow the input dtype (params fp32)
            window_strides=(self.stride, self.stride),
            padding=[(self.padding, self.padding)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class NormNonlinearity(nn.Module):
    """Phase-preserving norm-ReLU: equivariant replacement for FourierELU."""

    orders: Tuple[int, ...]

    @nn.compact
    def __call__(self, x: Array) -> Array:
        outs = []
        ci = 0
        for fi, m in enumerate(self.orders):
            if m == 0:
                outs.append(nn.gelu(x[..., ci : ci + 1]))
                ci += 1
            else:
                z = x[..., ci : ci + 2]
                norm = jnp.sqrt(jnp.sum(z * z, axis=-1, keepdims=True) + 1e-8)
                b = self.param(f"bias_{fi}", nn.initializers.zeros, (1,))
                outs.append(nn.relu(norm + b) * z / norm)
                ci += 2
        return jnp.concatenate(outs, axis=-1)


class NormBatchNorm(nn.Module):
    """Divide each field by the running RMS of its norm (GNormBatchNorm analog)."""

    orders: Tuple[int, ...]
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        n_fields = len(self.orders)
        ra = self.variable(
            "batch_stats", "norm_sq", lambda: jnp.ones((n_fields,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (n_fields,))
        outs = []
        ci = 0
        new_stats = []
        for fi, m in enumerate(self.orders):
            w = 1 if m == 0 else 2
            z = x[..., ci : ci + w]
            batch_ns = jnp.mean(jnp.sum(z * z, axis=-1))
            stat = jnp.where(training, batch_ns, ra.value[fi])
            outs.append(z * scale[fi] / jnp.sqrt(stat + self.epsilon))
            new_stats.append(batch_ns)
            ci += w
        if training and not self.is_initializing():
            ra.value = self.momentum * ra.value + (1 - self.momentum) * jnp.stack(new_stats)
        return jnp.concatenate(outs, axis=-1)


class SteerableNetwork(nn.Module):
    """Steerable canonicalization network -> (B, num_vectors, 2).

    Mirrors the reference ESCNNSteerableNetwork contract
    (escnn_networks.py:120-224): trivial input fields, num_layers hidden
    steerable blocks, output 2 x irrep(1) fields whose spatial mean gives the
    frame vectors. group_type is "rotation" (the reference asserts the same).
    """

    in_channels: int
    out_channels: int  # hidden fields per order
    kernel_size: int = 9
    num_layers: int = 1
    num_vectors: int = 2
    group_type: str = "rotation"
    num_rotations: int = -1  # continuous

    @nn.compact
    def __call__(self, x: Array, training: bool = False) -> Array:
        in_orders = tuple([0] * self.in_channels)
        hidden_orders = tuple(
            [0] * self.out_channels + [1] * self.out_channels + [2] * self.out_channels
        )
        h = x
        cur = in_orders
        for _ in range(self.num_layers):
            h = SteerableConv(
                in_orders=cur, out_orders=hidden_orders, kernel_size=self.kernel_size
            )(h)
            h = NormBatchNorm(orders=hidden_orders)(h, training=training)
            h = NormNonlinearity(orders=hidden_orders)(h)
            cur = hidden_orders
        out_orders = tuple([1] * self.num_vectors)
        h = SteerableConv(
            in_orders=cur, out_orders=out_orders, kernel_size=self.kernel_size
        )(h)
        v = jnp.mean(h, axis=(1, 2))  # (B, 2 * num_vectors)
        return v.reshape(v.shape[0], self.num_vectors, 2)
