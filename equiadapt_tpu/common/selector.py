"""Differentiable discrete group-element selection.

The reference backpropagates through the argmax over |G| group activations via
either a straight-through estimator or hard Gumbel-softmax
(reference: equiadapt/common/basecanonicalization.py:221-256). Both are pure
functions here; the Gumbel variant takes an explicit PRNG key (JAX-style
functional randomness instead of torch's global generator).

All selection happens on (B, |G|) activations — tiny tensors — so these run on
the VPU; what matters is that `stop_gradient` routes gradients only through
the softmax path, exactly as the reference's `.detach()` arithmetic does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jnp.ndarray


def hard_onehot(group_activations: Array) -> Array:
    """Non-differentiable argmax one-hot over the last axis (eval path)."""
    num_group = group_activations.shape[-1]
    idx = jnp.argmax(group_activations, axis=-1)
    return jax.nn.one_hot(idx, num_group, dtype=group_activations.dtype)


def straight_through_onehot(
    group_activations: Array, beta: float = 1.0, training: bool = True
) -> Array:
    """Straight-through one-hot: forward = argmax, backward = beta-softmax.

    Matches reference basecanonicalization.py:239-247, including the eval-mode
    behavior of returning the hard one-hot with no gradient path.
    """
    hard = hard_onehot(group_activations)
    if not training:
        return hard
    soft = jax.nn.softmax(beta * group_activations, axis=-1)
    return hard + soft - jax.lax.stop_gradient(soft)


def gumbel_softmax_onehot(
    group_activations: Array, rng: jax.Array, tau: float = 1.0
) -> Array:
    """Hard Gumbel-softmax sample (reference basecanonicalization.py:248-251).

    torch.nn.functional.gumbel_softmax(..., tau=1, hard=True) semantics:
    perturb logits with Gumbel(0,1) noise, softmax at temperature tau, then
    straight-through to the one-hot of the perturbed argmax.
    """
    gumbels = jax.random.gumbel(rng, group_activations.shape, group_activations.dtype)
    perturbed = (group_activations + gumbels) / tau
    soft = jax.nn.softmax(perturbed, axis=-1)
    hard = hard_onehot(perturbed)
    return hard + soft - jax.lax.stop_gradient(soft)


def select_onehot(
    group_activations: Array,
    *,
    gradient_trick: str = "straight_through",
    beta: float = 1.0,
    training: bool = True,
    rng: jax.Array | None = None,
) -> Array:
    """Dispatch on the gradient trick, mirroring the reference's switch."""
    if gradient_trick == "straight_through":
        return straight_through_onehot(group_activations, beta=beta, training=training)
    if gradient_trick == "gumbel_softmax":
        if not training:
            return hard_onehot(group_activations)
        if rng is None:
            raise ValueError("gumbel_softmax requires an rng key during training")
        return gumbel_softmax_onehot(group_activations, rng)
    raise ValueError(f"Gradient trick {gradient_trick} not implemented")
