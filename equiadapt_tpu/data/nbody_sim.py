"""Charged-particle and spring n-body simulators, vectorized with lax.scan.

TPU-native rebuild of reference examples/nbody/data/n_body_system/dataset/
synthetic_sim.py:8-360 (SpringSim, ChargedParticlesSim) and the dataset
generation CLI (generate_dataset.py). The reference integrates one
trajectory at a time with numpy loops; here the leapfrog integrator is a
`lax.scan` over time with the whole batch of systems integrated in parallel
on device — dataset generation is itself a TPU workload.

Physics matches the reference: leapfrog with dt = 1e-3, force
  F_ij = strength * e_ij * (x_i - x_j) / |x_i - x_j|^3
(springs: F_ij = -strength * e_ij * (x_i - x_j)), per-component clamping of
forces at 0.1/dt, initial |v| normalized to vel_norm.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

Array = jnp.ndarray

__all__ = ["simulate_charged", "simulate_springs", "generate_nbody_dataset"]

_DT = 1e-3
_MAX_F = 0.1 / _DT


def _pair_forces_charged(loc: Array, edges: Array, strength: float) -> Array:
    """loc: (B, n, 3), edges: (B, n, n) charge products -> (B, n, 3)."""
    diff = loc[:, :, None, :] - loc[:, None, :, :]  # x_i - x_j
    d2 = jnp.sum(diff * diff, axis=-1)
    n = loc.shape[1]
    eye = jnp.eye(n, dtype=bool)
    inv_d3 = jnp.where(eye[None], 0.0, 1.0 / jnp.maximum(d2, 1e-12) ** 1.5)
    f = strength * edges * inv_d3
    F = jnp.sum(f[..., None] * diff, axis=2)
    return jnp.clip(F, -_MAX_F, _MAX_F)


def _pair_forces_springs(loc: Array, edges: Array, strength: float) -> Array:
    diff = loc[:, :, None, :] - loc[:, None, :, :]
    F = -strength * jnp.sum(edges[..., None] * diff, axis=2)
    return jnp.clip(F, -_MAX_F, _MAX_F)


@partial(jax.jit, static_argnames=("steps", "sample_freq", "kind", "strength"))
def _simulate(
    loc0: Array,
    vel0: Array,
    edges: Array,
    steps: int,
    sample_freq: int,
    kind: str,
    strength: float,
) -> Tuple[Array, Array]:
    force = _pair_forces_charged if kind == "charged" else _pair_forces_springs

    def leap(carry, _):
        loc, vel = carry
        loc = loc + _DT * vel
        vel = vel + _DT * force(loc, edges, strength)
        return (loc, vel), None

    def sample_step(carry, _):
        carry, _ = jax.lax.scan(leap, carry, None, length=sample_freq)
        return carry, carry

    vel_half = vel0 + _DT * force(loc0, edges, strength)
    _, (locs, vels) = jax.lax.scan(
        sample_step, (loc0, vel_half), None, length=steps // sample_freq
    )
    # (T, B, n, 3) -> (B, T, n, 3)
    return jnp.swapaxes(locs, 0, 1), jnp.swapaxes(vels, 0, 1)


def simulate_charged(
    rng: jax.Array,
    batch: int,
    n_balls: int = 5,
    steps: int = 5000,
    sample_freq: int = 100,
    loc_std: float = 1.0,
    vel_norm: float = 0.5,
    strength: float = 1.0,
) -> Dict[str, Array]:
    """Batch of charged-particle trajectories (reference
    ChargedParticlesSim.sample_trajectory, synthetic_sim.py:240-360).

    Returns dict with loc/vel (B, T, n, 3) and charges (B, n, 1).
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    scale = loc_std * (n_balls / 5.0) ** (1 / 3)
    loc0 = jax.random.normal(k1, (batch, n_balls, 3)) * scale
    vel0 = jax.random.normal(k2, (batch, n_balls, 3))
    vel0 = vel0 * vel_norm / jnp.linalg.norm(vel0, axis=-1, keepdims=True)
    charges = jax.random.choice(k3, jnp.array([-1.0, 1.0]), (batch, n_balls, 1))
    edges = charges[..., 0][:, :, None] * charges[..., 0][:, None, :]
    locs, vels = _simulate(loc0, vel0, edges, steps, sample_freq, "charged", strength)
    return {"loc": locs, "vel": vels, "charges": charges, "edges": edges}


def simulate_springs(
    rng: jax.Array,
    batch: int,
    n_balls: int = 5,
    steps: int = 5000,
    sample_freq: int = 100,
    loc_std: float = 0.5,
    vel_norm: float = 0.5,
    strength: float = 0.1,
    spring_prob: Tuple[float, float, float] = (0.5, 0.0, 0.5),
) -> Dict[str, Array]:
    """Batch of spring-system trajectories (reference SpringSim)."""
    k1, k2, k3 = jax.random.split(rng, 3)
    loc0 = jax.random.normal(k1, (batch, n_balls, 3)) * loc_std
    vel0 = jax.random.normal(k2, (batch, n_balls, 3))
    vel0 = vel0 * vel_norm / jnp.linalg.norm(vel0, axis=-1, keepdims=True)
    springs = jax.random.choice(
        k3, jnp.array([0.0, 0.5, 1.0]), (batch, n_balls, n_balls),
        p=jnp.array(spring_prob),
    )
    edges = jnp.triu(springs) + jnp.swapaxes(jnp.triu(springs, 1), -1, -2)
    edges = edges * (1 - jnp.eye(n_balls))
    locs, vels = _simulate(loc0, vel0, edges, steps, sample_freq, "springs", strength)
    charges = jnp.zeros((batch, n_balls, 1))
    return {"loc": locs, "vel": vels, "charges": charges, "edges": edges}


def generate_nbody_dataset(
    rng: jax.Array,
    num_samples: int,
    n_balls: int = 5,
    frame_0: int = 30,
    frame_t: int = 40,
    steps: int = 5000,
    sample_freq: int = 100,
) -> Dict[str, Array]:
    """(loc, vel, charges, loc_end) training pairs — the nbody_small task
    (reference prepare/nbody_data.py:143-167: predict frame 40 from 30)."""
    traj = simulate_charged(rng, num_samples, n_balls, steps, sample_freq)
    return {
        "loc": traj["loc"][:, frame_0],
        "vel": traj["vel"][:, frame_0],
        "charges": traj["charges"],
        "loc_end": traj["loc"][:, frame_t],
    }
