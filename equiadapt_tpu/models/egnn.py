"""N-body prediction networks: EGNN-style GNN and a coordinate Transformer.

TPU-native rebuild of reference examples/nbody/networks/gcl.py:76-178 (GCL)
and examples/nbody/networks/euclideangraph_base_models.py:29-160 (GNN,
Transformer, PositionalEncoding). Graphs are dense (B, n, ...) — message
passing is a masked all-pairs MLP + adjacency einsum, replacing
unsorted_segment_sum over flattened edge lists (n-body graphs are tiny and
complete, so the O(n^2) dense form is both simpler and faster on the MXU).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.nbody.vn_deepsets import complete_adjacency

Array = jnp.ndarray

__all__ = [
    "GCL",
    "GNN",
    "NBodyTransformer",
    "NBodyMLP",
    "GCLRF",
    "positional_encoding",
    "edge_attributes",
]


def edge_attributes(loc: Array, charges: Array) -> Array:
    """Dense (B, n, n, 2) edge features: [q_u * q_v, ||x_u - x_v||^2]
    (the pipeline's edge features, examples/nbody/model.py:71-77)."""
    qq = charges[..., 0][:, :, None] * charges[..., 0][:, None, :]
    diff = loc[:, :, None, :] - loc[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    return jnp.stack([qq, d2], axis=-1)


class GCL(nn.Module):
    """EGNN-style graph conv layer (reference gcl.py:76-178).

    edge: m_uv = MLP([h_u, h_v, e_uv]); node: h_u' = MLP([h_u, sum_v m_uv])
    (+ residual). Aggregation matches the reference's segment-sum over the
    source index of a bidirectional edge list == masked sum over neighbors.
    """

    hidden_dim: int
    attention: bool = False
    recurrent: bool = True

    @nn.compact
    def __call__(self, h: Array, adjacency: Array, edge_attr: Array) -> Array:
        """h: (B, n, d); adjacency: (n, n); edge_attr: (B, n, n, e)."""
        B, n, d = h.shape
        hu = jnp.broadcast_to(h[:, :, None, :], (B, n, n, d))
        hv = jnp.broadcast_to(h[:, None, :, :], (B, n, n, d))
        e_in = jnp.concatenate([hu, hv, edge_attr], axis=-1)
        m = nn.Dense(self.hidden_dim)(e_in)
        m = nn.silu(m)
        m = nn.Dense(self.hidden_dim)(m)
        m = nn.silu(m)
        if self.attention:
            a = nn.Dense(self.hidden_dim)(jnp.abs(hu - hv))
            a = nn.silu(a)
            a = nn.sigmoid(nn.Dense(1)(a))
            m = m * a
        agg = jnp.einsum("uv,buvd->bud", adjacency, m)
        out = jnp.concatenate([h, agg], axis=-1)
        out = nn.Dense(self.hidden_dim)(out)
        out = nn.silu(out)
        out = nn.Dense(self.hidden_dim)(out)
        if self.recurrent:
            out = out + h
        return out


class GNN(nn.Module):
    """Message-passing predictor of future locations
    (reference euclideangraph_base_models.py:29-77): embeds [loc, vel],
    n_layers of GCL, decodes to a 3-vector per node."""

    hidden_dim: int = 64
    num_layers: int = 4
    attention: bool = False

    @nn.compact
    def __call__(
        self,
        loc: Array,
        vel: Array,
        charges: Array,
        adjacency: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        """(B, n, 3) x2 + (B, n, 1) -> (B, n, 3) predicted displacement."""
        n = loc.shape[1]
        if adjacency is None:
            adjacency = complete_adjacency(n)
        edge_attr = edge_attributes(loc, charges)
        h = nn.Dense(self.hidden_dim)(jnp.concatenate([loc, vel], axis=-1))
        for _ in range(self.num_layers):
            h = GCL(self.hidden_dim, attention=self.attention)(h, adjacency, edge_attr)
        h = nn.Dense(self.hidden_dim)(h)
        h = nn.silu(h)
        return nn.Dense(3)(h)


class NBodyMLP(nn.Module):
    """Per-node MLP baseline (the reference's MLP model in
    euclideangraph_base_models.py): no message passing, concatenated
    [loc, vel, charge] features."""

    hidden_dim: int = 64
    num_layers: int = 4

    @nn.compact
    def __call__(
        self, loc: Array, vel: Array, charges: Array,
        adjacency: Optional[Array] = None, training: bool = False,
    ) -> Array:
        h = jnp.concatenate([loc, vel, charges], axis=-1)
        for _ in range(self.num_layers - 1):
            h = nn.Dense(self.hidden_dim)(h)
            h = nn.silu(h)
        return nn.Dense(3)(h)


class GCLRF(nn.Module):
    """Radial-field graph layer (the reference's GCL_rf, gcl.py): messages
    are scalar functions of pairwise distance times the displacement
    vector — an E(n)-equivariant coordinate update."""

    hidden_dim: int = 64

    @nn.compact
    def __call__(self, loc: Array, adjacency: Array) -> Array:
        diff = loc[:, :, None, :] - loc[:, None, :, :]
        d2 = jnp.sum(diff * diff, axis=-1, keepdims=True)
        m = nn.Dense(self.hidden_dim)(d2)
        m = nn.silu(m)
        m = nn.Dense(1)(m)
        upd = jnp.einsum("uv,buvd->bud", adjacency, m * diff)
        return loc + upd


def positional_encoding(x: Array, hidden_dim: int) -> Array:
    """Sinusoidal encoding of coordinate *values*
    (reference euclideangraph_base_models.py:139-160).

    x: (..., k) scalars -> (..., k, hidden_dim).
    """
    half = hidden_dim // 2
    div = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / hidden_dim))
    ang = x[..., None] * div  # (..., k, half)
    pe = jnp.zeros(x.shape + (hidden_dim,), x.dtype)
    pe = pe.at[..., 0::2].set(jnp.sin(ang))
    pe = pe.at[..., 1::2].set(jnp.cos(ang))
    return pe


class NBodyTransformer(nn.Module):
    """Transformer over particle tokens
    (reference euclideangraph_base_models.py:79-137): token = positional
    encodings of the 6 coordinates + a charge embedding, width 7*hidden."""

    hidden_dim: int = 32
    num_layers: int = 2
    nheads: int = 2
    ff_hidden: int = 128

    @nn.compact
    def __call__(
        self,
        loc: Array,
        vel: Array,
        charges: Array,
        adjacency: Optional[Array] = None,
        training: bool = False,
    ) -> Array:
        B, n, _ = loc.shape
        coords = jnp.concatenate([loc, vel], axis=-1)  # (B, n, 6)
        pe = positional_encoding(coords, self.hidden_dim)  # (B, n, 6, h)
        charge_idx = (charges[..., 0] > 0).astype(jnp.int32)  # {-1,1} -> {0,1}
        ce = nn.Embed(2, self.hidden_dim)(charge_idx)  # (B, n, h)
        tokens = jnp.concatenate(
            [pe.reshape(B, n, 6 * self.hidden_dim), ce], axis=-1
        )  # (B, n, 7h)
        d_model = 7 * self.hidden_dim
        h = tokens
        for _ in range(self.num_layers):
            attn = nn.MultiHeadDotProductAttention(
                num_heads=self.nheads, qkv_features=d_model
            )(h, h)
            h = nn.LayerNorm()(h + attn)
            ff = nn.Dense(self.ff_hidden)(h)
            ff = nn.relu(ff)
            ff = nn.Dense(d_model)(ff)
            h = nn.LayerNorm()(h + ff)
        h = nn.Dense(d_model)(h)
        h = nn.relu(h)
        return nn.Dense(3)(h)
