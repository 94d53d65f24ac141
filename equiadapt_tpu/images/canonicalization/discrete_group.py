"""Discrete-group (C_n / D_n) image canonicalizers.

TPU-native rebuild of reference equiadapt/images/canonicalization/
discrete_group.py:20-512. Differences by design:

* Pure-functional: `canonicalize` returns `(x_canon, DiscreteCanonicalizationInfo)`
  instead of mutating an info dict; `invert_canonicalization` consumes the
  info explicitly (jit/pjit-safe).
* The reference's pad(edge, 0.5W) -> kornia.rotate -> center-crop sandwich
  (discrete_group.py:207-215) becomes a single border-clamped bilinear warp
  (ops/warp.py) — no 2x-sized intermediate, ~4x less HBM traffic.
* The optimized variant's Python loop over |G| orbit degrees
  (discrete_group.py:387-409) becomes one batched rotate over a
  (|G| * B) leading axis — a single XLA kernel, and the #1 fusion target in
  BASELINE.md.
* Targets (boxes/masks) are co-canonicalized with fully batched ops
  (ops/boxes.py) instead of a per-sample Python loop
  (discrete_group.py:217-236).

Layouts: NHWC; group activations (B, |G|) with fiber order
[rotations, reflections] (D_n).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from equiadapt_tpu.common.base import BaseCanonicalization
from equiadapt_tpu.common.info import (
    DiscreteCanonicalizationInfo,
    DiscreteGroupElement,
)
from equiadapt_tpu.common.selector import select_onehot
from equiadapt_tpu.ops.boxes import flip_boxes, flip_masks, rotate_boxes
from equiadapt_tpu.ops.group_action import get_action_on_image_features
from equiadapt_tpu.ops.warp import (
    center_crop,
    group_angles,
    hflip,
    resize,
    rotate_discrete,
)

Array = jnp.ndarray

__all__ = [
    "DiscreteGroupImageCanonicalization",
    "GroupEquivariantImageCanonicalization",
    "OptimizedGroupEquivariantImageCanonicalization",
    "optimization_specific_loss",
]


class DiscreteGroupImageCanonicalization(BaseCanonicalization):
    """Base discrete image canonicalizer.

    Attributes mirror the reference hyperparams (discrete_group.py:36-92):
    `beta` scales the softmax in the straight-through selector;
    `input_crop_ratio` / `resize_shape` shape the canonicalization-network
    input; grayscale inputs (in_channels == 1, e.g. rotated MNIST) skip the
    crop/resize and use zeros-fill rotation instead of edge padding.
    """

    canonicalization_network: nn.Module
    in_shape: Tuple[int, int, int]  # (H, W, C)
    beta: float = 1.0
    input_crop_ratio: float = 1.0
    resize_shape: Optional[int] = None
    gradient_trick: str = "straight_through"
    # "exact": static-tap 4-tap warps, bit-parity with the torch reference.
    # "fast": two-pass MXU residual warps (ops/warp.rotate_twopass) — the
    # production eval mode; 90-degree elements stay bit-exact.
    warp_mode: str = "exact"
    # computation dtype for the energy network + warps (e.g. jnp.bfloat16);
    # None keeps the input dtype. Selection logits are always fp32.
    compute_dtype: Optional[Any] = None
    # dtype of the canonicalized output: None casts back to the input dtype
    # (the reference-faithful contract); "compute" keeps compute_dtype. A
    # bf16 prediction network immediately re-casts a fp32 canonicalized
    # batch to bf16, so the serving pipeline sets "compute" to guarantee
    # the bf16->fp32->bf16 convert pair (a full-size HBM round trip if XLA
    # does not fold it through the intervening layout op) never exists.
    output_dtype: Optional[str] = None

    # subclasses set these in __post_init__
    group_type: str = "rotation"
    num_rotations: int = 4

    @property
    def is_grayscale(self) -> bool:
        return self.in_shape[-1] == 1

    @property
    def num_group(self) -> int:
        return self.num_rotations * (2 if self.group_type == "roto-reflection" else 1)

    @property
    def padding_mode(self) -> str:
        # RGB: edge-pad + crop sandwich == border sampling; grayscale: zeros
        return "zeros" if self.is_grayscale else "border"

    def transformations_before_canonicalization_network_forward(self, x: Array) -> Array:
        """Center-crop by input_crop_ratio then resize (discrete_group.py:174-188)."""
        if self.is_grayscale:
            return x
        H, W = self.in_shape[0], self.in_shape[1]
        ch = math.ceil(H * self.input_crop_ratio)
        cw = math.ceil(W * self.input_crop_ratio)
        if (ch, cw) != (H, W):
            x = center_crop(x, (ch, cw))
        if self.resize_shape is not None:
            x = resize(x, (self.resize_shape, self.resize_shape))
        return x

    def get_group_activations(self, x: Array, training: bool) -> Tuple[Array, Dict[str, Array]]:
        """Subclass hook -> ((B, |G|) activations, extras dict)."""
        raise NotImplementedError

    def get_group_activations_nchw(self, x_nchw: Array, training: bool):
        """Optional subclass hook: activations from an (B, C, H, W) batch.

        Returning non-None opts the canonicalizer into the NCHW-spine
        serving path (see `_canonicalize_nchw_fast`). Base returns None —
        the orbit-scoring (optimized) variant keeps the NHWC flow.
        """
        return None

    def _canonicalize_nchw_fast(self, x: Array, training: bool):
        """Eval fast-mode NCHW spine: one cast+transpose feeds every
        consumer (energy crop/resize, residual two-pass, select kernel).

        The generic path casts the NHWC input, warps it through
        `rotate_select` (which transposes to NCHW internally), and lets the
        energy read a separate NHWC cast — XLA then materializes an extra
        input relayout for the divergent consumers plus moveaxis brackets
        around the pallas custom call (~0.9 ms at 224px/batch 256,
        docs/benchmarking.md round-3 attribution). Here the (B, C, H, W)
        bf16 tensor is produced once; the select emits NCHW and a single
        moveaxis feeds the prediction network. Selected planes are
        bit-identical to the NHWC path (same kernels, same einsum
        contractions); the energy's crop+resize runs on NCHW axes, which
        matches the NHWC resize to float-rounding.

        Applies to both warp modes (the exact mode's static-tap residual
        sources have an NCHW entry too, `ops/warp._static_rotate_from_nchw`,
        bit-identical to the NHWC taps). The energy's crop+resize runs on
        NCHW axes — a float-rounding-level layout difference from the NHWC
        resize, argmax-stable in tests (see DEVIATIONS.md).

        Returns None when the preconditions don't hold (training,
        non-square, targets, CPU backend, or no NCHW energy hook).
        """
        from equiadapt_tpu.kernel_options import current_kernel_options
        from equiadapt_tpu.ops.pallas.select_warp import (
            _c_n_decomposition,
            rotate_select_nchw,
        )

        opts = current_kernel_options()
        # nchw_spine: "never" (default since round 4 — the
        # hybrid arrangement in `canonicalize`'s generic path, where the
        # energy and the residual two-pass read the NHWC bf16 cast and
        # only the select kernel's sources are NCHW, measures 7.4%
        # wrapper overhead vs the NCHW spine's 9.2% at C8/224px: the
        # spine's single NCHW materialization forks into divergent
        # consumer layouts anyway, paying two extra relayout copies),
        # "auto" (enable on TPU), or "interpret" (force the branch
        # through the interpret-mode kernel — lets the CPU test suite
        # drive this path end-to-end)
        spine = opts.nchw_spine
        interpret = spine == "interpret"
        if (
            training
            or spine == "never"
            or not isinstance(x.shape[0], int)  # symbolic-batch export:
            # rotate_select_nchw calls the pallas kernel unconditionally;
            # fall back to the generic path, whose dispatchers are gated
            or x.shape[1] != x.shape[2]
            or (jax.default_backend() != "tpu" and not interpret)
            or len(_c_n_decomposition(self.num_rotations, -1.0)[0]) > 4
        ):
            return None
        in_dtype = x.dtype
        dt = self.compute_dtype or x.dtype
        x_nchw = jnp.moveaxis(x, -1, 1).astype(dt)
        if opts.spine_barrier != "never":
            # Materialize the cast+transpose ONCE: without the barrier XLA
            # forks the input for its divergent consumers (energy resize,
            # residual two-pass GEMM, select kernel), emitting a second
            # full-batch fp32 read+convert plus an NHWC intermediate copy
            # (~0.5 ms at 224px/batch 256 — round-4 device-op profile).
            # Consumers that prefer another layout then pay at most one
            # bf16->bf16 relayout, which is strictly cheaper.
            x_nchw = jax.lax.optimization_barrier(x_nchw)
        with jax.named_scope("canon/get_group_activations"):
            energy_out = self.get_group_activations_nchw(x_nchw, training)
            if energy_out is None:
                return None
            acts, extras = energy_out
            acts = acts.astype(jnp.float32)
        with jax.named_scope("canon/select_element"):
            element, onehot = self.groupactivations_to_groupelement(acts, training)
        with jax.named_scope("canon/warp"):
            if element.reflection is not None:
                r = element.reflection[:, None, None, None].astype(dt)
                x_nchw = (1.0 - r) * x_nchw + r * x_nchw[..., ::-1]
            n = self.num_rotations
            rot_onehot = (
                onehot[:, :n] + onehot[:, n:]
                if self.group_type == "roto-reflection"
                else onehot
            )
            idx = jnp.argmax(rot_onehot, axis=-1)
            out = rotate_select_nchw(
                x_nchw, idx, n, -1.0, self.padding_mode,
                self.warp_mode, interpret,
            )
            out_dt = x_nchw.dtype if self.output_dtype == "compute" else in_dtype
            x_canon = jnp.moveaxis(out, 1, -1).astype(out_dt)
        info = DiscreteCanonicalizationInfo(
            group_activations=acts,
            onehot=onehot,
            element=element,
            num_rotations=self.num_rotations,
            group_type=self.group_type,
            extras=extras,
        )
        return x_canon, info

    def groupactivations_to_groupelement(
        self, group_activations: Array, training: bool
    ) -> Tuple[DiscreteGroupElement, Array]:
        """Differentiable argmax -> (rotation degrees, reflect indicator).

        Reference discrete_group.py:94-135 + basecanonicalization.py:221-256.
        """
        rng = None
        if self.gradient_trick == "gumbel_softmax" and training:
            rng = self.make_rng("gumbel")
        onehot = select_onehot(
            group_activations,
            gradient_trick=self.gradient_trick,
            beta=self.beta,
            training=training,
            rng=rng,
        )
        angles = group_angles(self.num_rotations)
        if self.group_type == "roto-reflection":
            rot_table = jnp.concatenate([angles, angles])
            refl_table = jnp.concatenate(
                [jnp.zeros(self.num_rotations), jnp.ones(self.num_rotations)]
            )
            rotation = jnp.sum(onehot * rot_table, axis=-1)
            reflection = jnp.sum(onehot * refl_table, axis=-1)
            return DiscreteGroupElement(rotation_deg=rotation, reflection=reflection), onehot
        rotation = jnp.sum(onehot * angles, axis=-1)
        return DiscreteGroupElement(rotation_deg=rotation, reflection=None), onehot

    @nn.compact
    def canonicalize(
        self,
        x: Array,
        targets: Optional[Dict[str, Array]] = None,
        *,
        training: bool = False,
        **kwargs: Any,
    ):
        """Map the batch to canonical pose (reference discrete_group.py:190-238).

        Args:
            x: (B, H, W, C).
            targets: optional dict with "boxes" (B, N, 4) xyxy and
                "masks" (B, N, H, W) to co-canonicalize (batched; the
                reference loops per sample).
        """
        if targets is None:
            nchw_fast = self._canonicalize_nchw_fast(x, training)
            if nchw_fast is not None:
                return nchw_fast
        in_dtype = x.dtype
        x_energy = (
            x.astype(self.compute_dtype) if self.compute_dtype is not None else x
        )
        with jax.named_scope("canon/get_group_activations"):
            acts, extras = self.get_group_activations(x_energy, training)
            acts = acts.astype(jnp.float32)  # selection logits stay fp32
        with jax.named_scope("canon/select_element"):
            element, onehot = self.groupactivations_to_groupelement(acts, training)

        with jax.named_scope("canon/warp"):
            if self.compute_dtype is not None:
                x = x.astype(self.compute_dtype)
            if element.reflection is not None:
                r = element.reflection[:, None, None, None].astype(x.dtype)
                x = (1.0 - r) * x + r * hflip(x)
            # rotation one-hot (collapses the reflection coset for D_n);
            # static-tap warp blend — identical numerics to
            # rotate(x, -theta), ~50x faster (see ops/warp.rotate_discrete).
            # In eval the one-hot is hard and carries no gradient, so the
            # single-pass select path applies (pallas kernel in exact mode,
            # two-pass MXU blend in fast mode).
            n = self.num_rotations
            rot_onehot = (
                onehot[:, :n] + onehot[:, n:] if self.group_type == "roto-reflection"
                else onehot
            )
            if training:
                x = rotate_discrete(
                    x, rot_onehot.astype(x.dtype), n, sign=-1.0,
                    padding_mode=self.padding_mode, mode=self.warp_mode,
                )
            else:
                from equiadapt_tpu.ops.pallas.select_warp import rotate_select

                idx = jnp.argmax(rot_onehot, axis=-1)
                x = rotate_select(x, idx, n, -1.0, self.padding_mode, self.warp_mode)
            if self.output_dtype != "compute":
                x = x.astype(in_dtype)

        info = DiscreteCanonicalizationInfo(
            group_activations=acts,
            onehot=onehot,
            element=element,
            num_rotations=self.num_rotations,
            group_type=self.group_type,
            extras=extras,
        )

        if targets is not None:
            width = x.shape[2]
            boxes, masks = targets["boxes"], targets["masks"]
            if element.reflection is not None:
                r = element.reflection
                boxes_f = flip_boxes(boxes, width)
                masks_f = flip_masks(masks)
                boxes = (1.0 - r[:, None, None]) * boxes + r[:, None, None] * boxes_f
                masks = (1.0 - r[:, None, None, None]) * masks + r[:, None, None, None] * masks_f
            boxes = rotate_boxes(boxes, element.rotation_deg, width)
            # mask angles come from the discrete set, so the static-tap
            # blend/select machinery applies (the generic rotate_masks would
            # hit the slow dynamic-gather path for these traced angles)
            N = masks.shape[1]
            masks_nhwc = jnp.moveaxis(masks, 1, -1)  # (B, H, W, N)
            if training:
                masks_nhwc = rotate_discrete(
                    masks_nhwc, rot_onehot.astype(masks_nhwc.dtype), n,
                    sign=-1.0, padding_mode="zeros", mode=self.warp_mode,
                )
            else:
                from equiadapt_tpu.ops.pallas.select_warp import rotate_select

                masks_nhwc = rotate_select(
                    masks_nhwc, jnp.argmax(rot_onehot, axis=-1), n, -1.0,
                    "zeros", self.warp_mode,
                )
            masks = jnp.moveaxis(masks_nhwc, -1, 1)
            return x, {**targets, "boxes": boxes, "masks": masks}, info

        return x, info

    def invert_canonicalization(
        self,
        info: DiscreteCanonicalizationInfo,
        x_canonicalized_out: Array,
        induced_rep_type: str = "regular",
        training: bool = False,
        **kwargs: Any,
    ) -> Array:
        """Apply the stored group element to canonical-frame outputs
        (reference discrete_group.py:240-259).

        With training=True the spatial rotation uses the differentiable
        (straight-through) one-hot from the info pytree, so losses computed
        on inverted outputs backprop to the canonicalization network; the
        fiber roll stays hard, like the reference's `.long()` shift
        (images/utils.py:28). Eval keeps the single-pass hard select.
        """
        with jax.named_scope("canon/invert"):
            return self._invert(info, x_canonicalized_out, induced_rep_type, training)

    def _invert(self, info, x_canonicalized_out, induced_rep_type, training=False):
        rotation_onehot = None
        if training:
            oh = info.onehot
            n = info.num_rotations
            # collapse the reflection coset onto the rotation one-hot
            rotation_onehot = oh[:, :n] + oh[:, n:] if oh.shape[-1] == 2 * n else oh
            rotation_onehot = rotation_onehot.astype(x_canonicalized_out.dtype)
        return get_action_on_image_features(
            x_canonicalized_out,
            num_rotations=info.num_rotations,
            num_group=info.num_group,
            rotation_deg=info.element.rotation_deg,
            reflection=info.element.reflection,
            induced_rep_type=induced_rep_type,
            rotation_onehot=rotation_onehot,
            mode=self.warp_mode,
        )


class GroupEquivariantImageCanonicalization(DiscreteGroupImageCanonicalization):
    """Energy from a group-equivariant network (discrete_group.py:262-317).

    The network's output fiber *is* the activation vector; `group_type` /
    `num_rotations` must match the network's (the registry factory wires them
    from the network attributes, like the reference's constructor does at
    discrete_group.py:290-296).
    """

    def get_group_activations(self, x: Array, training: bool):
        x = self.transformations_before_canonicalization_network_forward(x)
        acts = self.canonicalization_network(x, training=training)
        return acts, {}

    def get_group_activations_nchw(self, x_nchw: Array, training: bool):
        """NCHW-spine energy: crop + resize on (B, C, H, W) axes, then one
        small moveaxis into the NHWC GCNN (12 MB at 64px vs transposing the
        full-resolution batch)."""
        if self.is_grayscale:
            return None
        H, W = self.in_shape[0], self.in_shape[1]
        ch = math.ceil(H * self.input_crop_ratio)
        cw = math.ceil(W * self.input_crop_ratio)
        x = x_nchw
        if (ch, cw) != (H, W):
            top = int(round((H - ch) / 2.0))
            left = int(round((W - cw) / 2.0))
            x = x[:, :, top : top + ch, left : left + cw]
        if self.resize_shape is not None:
            B, C = x.shape[0], x.shape[1]
            x = jax.image.resize(
                x, (B, C, self.resize_shape, self.resize_shape), method="linear"
            )
        acts = self.canonicalization_network(
            jnp.moveaxis(x, 1, -1), training=training
        )
        return acts, {}


class OptimizedGroupEquivariantImageCanonicalization(DiscreteGroupImageCanonicalization):
    """Energy from orbit scoring with a plain network
    (reference discrete_group.py:320-512).

    Materializes the full |G|-orbit as a single batched warp (leading-axis
    |G|*B, group-major to match the reference's reshape at :478-480), runs
    the non-equivariant network once on the big batch, and scores each orbit
    element by cosine similarity to a (learnable) reference vector.
    """

    out_vector_size: int = 128
    learn_ref_vec: bool = False
    artifact_err_wt: float = 0.0
    # Group-parallel training (parallel/group_parallel.py): names of the
    # (group, data) mesh axes to constrain the (|G|*B) orbit batch onto,
    # e.g. ("group", "data"). The orbit is reshaped (G, B, h, w, C), the
    # G axis sharded over the group axis and B over the data axis, so the
    # non-equivariant network's big-batch pass runs G-ways concurrent and
    # the only cross-device traffic is the (B, G) activation gather XLA
    # inserts for the reshape/argmax. Requires an active Mesh whose axis
    # names match (jit under `with mesh:`); None (default) leaves
    # placement to the compiler — single-chip behavior is unchanged.
    orbit_sharding: Optional[Tuple[str, str]] = None

    def group_augment(self, x: Array) -> Array:
        """(B, h, w, C) -> (|G|*B, h, w, C) orbit, group-major.

        Replaces the reference's per-degree pad/rotate/crop loop
        (discrete_group.py:387-427): exact rot90/flip permutations (fused
        orbit kernel, ops/pallas/orbit.py) when |rotations| divides 4, one
        batched border-sampled rotate otherwise.
        """
        from equiadapt_tpu.ops.pallas.orbit import materialize_orbit

        return materialize_orbit(
            x, self.num_rotations, group_type=self.group_type,
            padding_mode=self.padding_mode, mode=self.warp_mode,
        )

    def get_group_activations(self, x: Array, training: bool):
        x = self.transformations_before_canonicalization_network_forward(x)
        B = x.shape[0]
        G = self.num_group
        x_aug = self.group_augment(x)  # (G*B, h, w, C)
        if self.orbit_sharding is not None:
            from jax.sharding import PartitionSpec

            gax, dax = self.orbit_sharding
            x_aug = jax.lax.with_sharding_constraint(
                x_aug.reshape(G, B, *x_aug.shape[1:]),
                PartitionSpec(gax, dax),
            ).reshape(G * B, *x_aug.shape[1:])
        vector_out = self.canonicalization_network(x_aug, training=training)
        extras = {"vector_out": vector_out}

        if self.artifact_err_wt:
            # random double-rotation dummies isolate interpolation artifacts
            # (reference discrete_group.py:448-473)
            rng = self.make_rng("artifact")
            idx = jax.random.randint(rng, (x_aug.shape[0],), 0, self.num_rotations)
            oh = jax.nn.one_hot(idx, self.num_rotations, dtype=x_aug.dtype)
            mode = self.padding_mode
            x_dummy = rotate_discrete(x_aug, oh, self.num_rotations, -1.0, mode)
            x_dummy = rotate_discrete(x_dummy, oh, self.num_rotations, 1.0, mode)
            extras["vector_out_dummy"] = self.canonicalization_network(
                x_dummy, training=training
            )

        ref = self.param(
            "reference_vector",
            nn.initializers.normal(stddev=1.0),
            (1, self.out_vector_size),
        )
        if not self.learn_ref_vec:
            ref = jax.lax.stop_gradient(ref)
        # cosine similarity per orbit element
        vn = vector_out / (
            jnp.linalg.norm(vector_out, axis=-1, keepdims=True) + 1e-12
        )
        rn = ref / (jnp.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
        scalar = jnp.sum(vn * rn, axis=-1)  # (G*B,)
        acts = scalar.reshape(G, B).T  # (B, G) — group-major unflatten, ref :478-480
        return acts, extras


def optimization_specific_loss(
    info: DiscreteCanonicalizationInfo,
    *,
    out_vector_size: int,
    artifact_err_wt: float = 0.0,
) -> Array:
    """Orthogonality + rotation-artifact loss for the optimized canonicalizer.

    Reference discrete_group.py:483-512: orbit vectors should be mutually
    orthogonal per sample (mean |V V^T| off-diagonal) plus an optional MSE
    between dummy (double-rotated) and clean vectors.
    """
    vectors = info.extras["vector_out"]  # (G*B, D)
    G = info.num_group
    v = vectors.reshape(G, -1, out_vector_size).transpose(1, 0, 2)  # (B, G, D)
    distances = jnp.einsum("bgd,bhd->bgh", v, v)
    mask = 1.0 - jnp.eye(G, dtype=distances.dtype)
    loss = jnp.mean(jnp.abs(distances * mask))
    if artifact_err_wt:
        dummy = info.extras["vector_out_dummy"]
        loss = loss + artifact_err_wt * jnp.mean((dummy - vectors) ** 2)
    return loss
