"""VN-DeepSets canonicalization network for n-body graphs.

TPU-native rebuild of reference equiadapt/nbody/canonicalization_networks/
custom_equivariant_networks.py:13-280. Structural redesign:

* Dense (B, n_nodes, ...) shapes instead of flattened (B*n, ...) tensors
  with torch_scatter — graph pooling becomes axis reductions and one
  adjacency einsum, removing the hard-coded 5-nodes-per-graph wart
  (reference :132,136) and the scatter dependency entirely.
* Channels-last VN layout (B, n, 3, C) so every channel-mixing linear is a
  lane-dim matmul (see pointcloud/vector_neurons.py).
* Equivariance fixes (deliberate deviations, verified by tests):
  - VN linear maps are bias-free. The reference uses default-bias nn.Linear
    (reference :205-206), which adds a constant to each spatial component
    and silently breaks rotation equivariance.
  - The three frame vectors fed to Gram-Schmidt are the output *channel*
    vectors (each a spatial 3-vector that co-rotates with the input). The
    reference slices the (spatial, channel) output matrix along the spatial
    axis (reference :168 via euclidean_group.py:150-156), mixing channels,
    which also breaks exact equivariance.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from equiadapt_tpu.pointcloud.vector_neurons import VNLeakyReLU, VNSoftplus

Array = jnp.ndarray

__all__ = ["VNDeepSetLayer", "VNDeepSets", "complete_adjacency"]


def complete_adjacency(n_nodes: int) -> Array:
    """Dense adjacency of the complete digraph without self-loops (the
    reference's K5 edge list, examples/nbody/model_utils.py:60-89)."""
    a = jnp.ones((n_nodes, n_nodes), dtype=jnp.float32)
    return a - jnp.eye(n_nodes, dtype=jnp.float32)


def _pool_nodes(x: Array, how: str, axis: int = 1) -> Array:
    if how == "mean":
        return jnp.mean(x, axis=axis)
    if how == "sum":
        return jnp.sum(x, axis=axis)
    if how == "max":
        return jnp.max(x, axis=axis)
    raise ValueError(f"Unknown pooling {how}")


class VNDeepSetLayer(nn.Module):
    """One DeepSet message layer (reference :175-252).

    out = nonlinearity(identity_linear(x) + pooling_linear(aggregate(x)))
    with residual; aggregate is the adjacency einsum (sum or mean over
    in-neighbors).
    """

    out_channels: int
    nonlinearity: str = "relu"
    pooling: str = "sum"
    residual: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, adjacency: Array, training: bool = False) -> Array:
        """x: (B, n, 3, C), adjacency: (n, n) with a[u, v] = edge u -> v."""
        identity = nn.Dense(self.out_channels, use_bias=False, name="identity_linear")(x)
        agg = jnp.einsum("uv,bu...->bv...", adjacency, x)
        if self.pooling == "mean":
            deg = jnp.sum(adjacency, axis=0)  # in-degree per node v
            agg = agg / jnp.maximum(deg, 1.0)[None, :, None, None]
        pooled = nn.Dense(self.out_channels, use_bias=False, name="pooling_linear")(agg)
        h = identity + pooled
        if self.nonlinearity == "softplus":
            h = VNSoftplus(share_nonlinearity=False, name="nl")(h)
        elif self.nonlinearity == "relu":
            h = VNLeakyReLU(share_nonlinearity=False, negative_slope=0.0, name="nl")(h)
        elif self.nonlinearity == "leakyrelu":
            h = VNLeakyReLU(share_nonlinearity=False, name="nl")(h)
        else:
            raise ValueError(f"Unknown nonlinearity {self.nonlinearity}")
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        if self.residual and h.shape == x.shape:
            h = h + x
        return h


class VNDeepSets(nn.Module):
    """Frame + translation estimator for SE(3) n-body canonicalization.

    Mirrors the reference contract (custom_equivariant_networks.py:106-172):
    builds canonical features from centered positions (canon_feature in
    {p, pv, pva, pvc, pvac}), runs DeepSet layers, pools over the graph, and
    emits (rotation_vectors (B, 3, 3), translation (B, 3)).

    prediction_mode (out_dim == 1) returns per-node 3-vectors instead — the
    reference reuses this class as an equivariant *prediction* network.
    """

    hidden_dim: int = 16
    num_layers: int = 4
    layer_pooling: str = "mean"
    final_pooling: str = "mean"
    nonlinearity: str = "relu"
    canon_feature: str = "p"
    canon_translation: bool = False
    dropout: float = 0.0
    out_dim: int = 4

    @nn.compact
    def __call__(
        self,
        loc: Array,
        vel: Array,
        charges: Optional[Array] = None,
        adjacency: Optional[Array] = None,
        training: bool = False,
    ):
        """loc, vel: (B, n, 3); charges: (B, n, 1).

        Returns (rotation_vectors (B, 3, 3) rows = channel vectors,
        translation (B, 3)) — or (B, n, 3) in prediction mode.
        """
        B, n, _ = loc.shape
        if adjacency is None:
            adjacency = complete_adjacency(n)
        center = _pool_nodes(loc, self.layer_pooling, axis=1)  # (B, 3)
        canonical_loc = loc - center[:, None, :]

        feats = [canonical_loc]
        if "v" in self.canon_feature:
            feats.append(vel)
        if "a" in self.canon_feature:
            feats.append(jnp.cross(canonical_loc, vel))
        if "c" in self.canon_feature:
            if charges is None:
                raise ValueError("canon_feature with 'c' requires charges")
            feats.append(canonical_loc * charges)
        x = jnp.stack(feats, axis=-1)  # (B, n, 3, F)

        x = VNDeepSetLayer(
            self.hidden_dim, self.nonlinearity, self.layer_pooling,
            residual=False, dropout=self.dropout, name="first_set_layer",
        )(x, adjacency, training=training)
        for i in range(self.num_layers - 1):
            x = VNDeepSetLayer(
                self.hidden_dim, self.nonlinearity, self.layer_pooling,
                residual=True, dropout=self.dropout, name=f"set_layer_{i}",
            )(x, adjacency, training=training)

        if self.out_dim == 1:
            out = nn.Dense(1, use_bias=False, name="output_layer")(x)
            return out[..., 0]  # (B, n, 3) per-node vectors

        g = _pool_nodes(x, self.final_pooling, axis=1)  # (B, 3, hidden)
        out = nn.Dense(self.out_dim, use_bias=False, name="output_layer")(g)  # (B, 3, out)
        # channel vectors as rows: (B, out, 3)
        out = jnp.moveaxis(out, -1, -2)
        rotation_vectors = out[:, :3]  # (B, 3, 3)
        if self.canon_translation:
            translation = out[:, 3] + center
        else:
            translation = jnp.zeros_like(center) + center
        return rotation_vectors, translation
