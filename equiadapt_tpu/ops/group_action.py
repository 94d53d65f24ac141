"""Group actions on prediction-network outputs (invert_canonicalization).

TPU-native equivalent of reference equiadapt/images/utils.py:8-94
(`roll_by_gather`, `get_action_on_image_features`). Feature maps are NHWC with
regular-rep channels laid out C-major/G-minor: channel index = c * |G| + g,
matching the reference's reshape (B, C//|G|, |G|, H, W) after transposition to
channels-last.

Correctness note (deliberate deviation): the reference's reflection blend in
`get_action_on_image_features` (images/utils.py:62-64) multiplies the
*unreflected* branch by the reflect indicator, which inverts the condition
relative to its own `canonicalize` (discrete_group.py:209-211) and breaks the
invert(apply(x)) round trip for roto-reflection groups. Here the blend is
`(1 - r) * rotated + r * hflip(rotated)`, the group-theoretic inverse of
canonicalize (verified by the round-trip property tests in
tests/test_group_action.py).
"""

from __future__ import annotations

import functools
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from equiadapt_tpu.ops.warp import hflip, rotate, rotate_discrete

Array = jnp.ndarray

__all__ = [
    "roll_by_gather",
    "get_action_on_image_features",
    "invert_regular_fast_diff",
]


@lru_cache(maxsize=None)
def _roll_matrices(G: int) -> np.ndarray:
    """(G, G, G) circulant bank: C[s, h, k] = 1 iff h == (k - s) mod G."""
    s = np.arange(G)[:, None, None]
    h = np.arange(G)[None, :, None]
    k = np.arange(G)[None, None, :]
    return ((k - s) % G == h).astype(np.float32)


def roll_by_gather(feature_map: Array, shifts: Array) -> Array:
    """Cyclically roll the group fiber axis by per-sample shifts.

    Semantics of the reference's roll_by_gather (images/utils.py:8-29):
    output fiber g reads input fiber (g - shift) mod G, shifts truncated
    like `.long()`. TPU-native implementation: the roll is a per-sample
    (G x G) one-hot *matmul* on the tiny fiber axis — minor-axis gathers
    serialize on TPU, a fiber contraction stays on the VPU/MXU.

    Args:
        feature_map: (B, H, W, C, G) — fiber on the minor axis.
        shifts: (B,) integer or float shift amounts.
    """
    G = feature_map.shape[-1]
    shift_i = jnp.mod(shifts.astype(jnp.int32), G)
    sel = jax.nn.one_hot(shift_i, G, dtype=feature_map.dtype)  # (B, G)
    bank = jnp.asarray(_roll_matrices(G), dtype=feature_map.dtype)
    P = jnp.einsum("bs,shk->bhk", sel, bank)  # (B, G, G)
    return jnp.einsum("bxych,bhk->bxyck", feature_map, P)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def invert_regular_fast_diff(
    feature_map: Array,
    rotation_onehot: Array,
    reflection: Optional[Array],
    num_rotations: int,
    interpret: bool = False,
) -> Array:
    """Differentiable single-pass fused invert for the regular rep.

    Forward: the hard fused kernel (`rotate_roll_select` — spatial
    rotate-select + optional hflip + fiber roll in one pallas pass). This
    is exact for straight-through training because the ST one-hot's
    *forward values* are hard; only its gradient is soft.

    Backward (custom VJP, no |G|-candidate blends):
      * input cotangent — the transpose permutation chain
        Roll_{-s} . Flip^r . Rot_{sign-adjusted} as one more fused kernel
        call (exact for 90-degree elements; the two-pass interpolation's
        sample~splat approximation otherwise, as in
        `warp_center_rotation_fast_diff`);
      * rotation one-hot — the reference's angle pathway
        (discrete_group.py:213 differentiates kornia.rotate through the
        angle): d out/d theta(p) = grad(u)(p) . J (p - c) mapped through
        the roll/flip permutations, with grad(u) from central differences;
        then d theta / d onehot_g = theta_g (the angle table);
      * reflection — d out/d r = (1 - 2 r_hat)(hflip(out) - out), the
        closed-form blend derivative evaluated at the hard branch;
      * roll shift — hard, no gradient (reference images/utils.py:28
        `.long()`).
    """
    out, _ = _invert_fast_fwd_impl(
        feature_map, rotation_onehot, reflection, num_rotations, interpret
    )
    return out


def _invert_fast_fwd_impl(feature_map, rotation_onehot, reflection, n,
                          interpret=False):
    from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select

    idx = jnp.argmax(rotation_onehot, axis=-1).astype(jnp.int32)
    shift = idx  # roll amount == element index for C_n fibers
    refl_i = (
        None if reflection is None else jnp.round(reflection).astype(jnp.int32)
    )
    out = rotate_roll_select(
        feature_map, idx, shift, n, 1.0, "zeros", refl=refl_i,
        interpret=interpret,
    )
    return out, (idx, refl_i, out)


def _invert_fast_fwd(feature_map, rotation_onehot, reflection, num_rotations,
                     interpret):
    out, (idx, refl_i, _) = _invert_fast_fwd_impl(
        feature_map, rotation_onehot, reflection, num_rotations, interpret
    )
    # zero-size tokens carry the cotangent shapes/dtypes (residuals must
    # be JAX types)
    oh_token = jnp.zeros((0,) + rotation_onehot.shape, rotation_onehot.dtype)
    refl_token = (
        None if reflection is None
        else jnp.zeros((0,) + reflection.shape, reflection.dtype)
    )
    return out, (idx, refl_i, out, oh_token, refl_token)


def _invert_fast_bwd(num_rotations, interpret, res, g):
    from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select

    idx, refl_i, out, oh_token, refl_token = res
    oh_dtype = oh_token.dtype
    refl_dtype = None if refl_token is None else refl_token.dtype
    n = num_rotations
    B, H, W, C = out.shape
    dt = jnp.promote_types(out.dtype, jnp.float32)
    gf = g.astype(dt)

    # --- input cotangent: transpose = Roll_{-s} . Flip^r . Rot' ----------
    # Rot_{-theta} . Flip^r == Flip^r . Rot_{(-1)^(1-r) theta}; the kernel
    # applies Rot before Flip before Roll, so feed it the sign-adjusted
    # element index and the negated shift.
    if refl_i is None:
        idx_t = jnp.mod(-idx, n)
        refl_t = None
    else:
        idx_t = jnp.where(refl_i == 1, idx, jnp.mod(-idx, n))
        refl_t = refl_i
    xbar = rotate_roll_select(
        g, idx_t, jnp.mod(-idx, n), n, 1.0, "zeros", refl=refl_t,
        interpret=interpret,
    )

    # --- rotation one-hot: angle-pathway gradient ------------------------
    # u = Flip^r(Roll_{-s}(out)) is the purely-rotated field; theta-velocity
    # d u/d phi(p) = du/dx * (-(py-cy)) + du/dy * (px-cx) about the select
    # center ((W-1)/2, (H-1)/2), with ghat the matching permuted cotangent.
    G_fiber = n if refl_i is None else 2 * n
    u = out.astype(dt).reshape(B, H, W, C // G_fiber, G_fiber)
    gh = gf.reshape(B, H, W, C // G_fiber, G_fiber)
    if refl_i is None:
        u = roll_by_gather(u, -idx.astype(dt))
        gh = roll_by_gather(gh, -idx.astype(dt))
    else:
        u = jnp.concatenate(
            [roll_by_gather(u[..., :n], -idx.astype(dt)),
             roll_by_gather(u[..., n:], idx.astype(dt))], axis=-1
        )
        gh = jnp.concatenate(
            [roll_by_gather(gh[..., :n], -idx.astype(dt)),
             roll_by_gather(gh[..., n:], idx.astype(dt))], axis=-1
        )
        r = refl_i[:, None, None, None, None].astype(dt)
        u = (1.0 - r) * u + r * u[:, :, ::-1]
        gh = (1.0 - r) * gh + r * gh[:, :, ::-1]
    u = u.reshape(B, H, W, C)
    gh = gh.reshape(B, H, W, C)
    du_dy = jnp.gradient(u, axis=1)
    du_dx = jnp.gradient(u, axis=2)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    px = jnp.arange(W, dtype=dt) - cx
    py = jnp.arange(H, dtype=dt) - cy
    vel = du_dx * (-py[None, :, None, None]) + du_dy * px[None, None, :, None]
    # inscribed-disk mask: central differences across the zeros-padding
    # boundary produce spurious O(radius) velocity terms that would swamp
    # the interior signal; the reference's tap-gradient boundary terms are
    # equally arbitrary there, so the integral runs over the valid disk
    rad2 = px[None, None, :] ** 2 + py[None, :, None] ** 2
    disk = (rad2 <= (min(H, W) / 2.0 - 2.0) ** 2).astype(dt)[..., None]
    phi_bar = jnp.sum(gh * vel * disk, axis=(1, 2, 3))  # d loss/d theta_rad
    # rotate(y, +theta) samples at R(+theta)(p-c)+c (ops/warp.rotate), so
    # du/dtheta = grad(u) . J (p-c) directly; degrees need the pi/180 chain
    theta_bar_deg = phi_bar * (jnp.pi / 180.0)
    angles = jnp.linspace(0.0, 360.0, n + 1, dtype=dt)[:n]
    onehot_bar = (theta_bar_deg[:, None] * angles[None, :]).astype(oh_dtype)

    # --- reflection ------------------------------------------------------
    if refl_i is None:
        refl_bar = None
    else:
        sign_r = (1.0 - 2.0 * refl_i.astype(dt))
        flip_m_out = hflip(out.astype(dt)) - out.astype(dt)
        refl_bar = (sign_r * jnp.sum(gf * flip_m_out, axis=(1, 2, 3))).astype(
            refl_dtype
        )
    return xbar.astype(g.dtype), onehot_bar, refl_bar


invert_regular_fast_diff.defvjp(_invert_fast_fwd, _invert_fast_bwd)


def get_action_on_image_features(
    feature_map: Array,
    *,
    num_rotations: int,
    num_group: int,
    rotation_deg: Array,
    reflection: Optional[Array] = None,
    induced_rep_type: str = "regular",
    rotation_onehot: Optional[Array] = None,
    mode: str = "exact",
) -> Array:
    """Apply the stored group element to a canonical-frame output feature map.

    Spatial part: rotate by +rotation_deg (undoing canonicalize's -rotation),
    then conditionally hflip. Regular rep additionally rolls the channel
    fiber: rotation fibers by +k, reflection fibers by -k, where
    k = rotation_deg / 360 * num_rotations (reference images/utils.py:54-79).

    Args:
        feature_map: (B, H, W, C) NHWC; for "regular", C % num_group == 0 with
            C-major/G-minor fiber layout.
        num_rotations: |rotations| in the group.
        num_group: |G| (== num_rotations or 2 * num_rotations).
        rotation_deg: (B,) selected rotation angles in degrees.
        reflection: (B,) soft reflect indicator, or None.
        induced_rep_type: "regular" | "scalar" ("vector" is unimplemented in
            the reference, images/utils.py:90-92, and likewise here).
    """
    from equiadapt_tpu.ops.pallas.select_warp import rotate_select

    B, H, W, C = feature_map.shape
    step = 360.0 / num_rotations
    idx = jnp.mod(jnp.round(rotation_deg / step).astype(jnp.int32), num_rotations)

    def _rot(y):
        # hard selection (matches the reference's non-differentiable `.long()`
        # shift, images/utils.py:28). If a differentiable one-hot was given,
        # keep the blend path so gradients reach the selection.
        if rotation_onehot is not None:
            return rotate_discrete(
                y, rotation_onehot, num_rotations, sign=1.0, padding_mode="zeros",
                mode=mode,
            )
        return rotate_select(y, idx, num_rotations, 1.0, "zeros", mode)

    if induced_rep_type == "regular":
        if C % num_group != 0:
            raise ValueError(
                f"regular rep needs channels divisible by |G|={num_group}, got {C}"
            )
        from equiadapt_tpu.ops.pallas.select_warp import _c_n_decomposition

        fused_ok = (
            mode in ("fast", "exact")
            and num_group in (num_rotations, 2 * num_rotations)
            and (reflection is None) == (num_group == num_rotations)
            and jax.default_backend() == "tpu"
            # pallas grids tile on the batch: under shape-polymorphic
            # export the batch dim is symbolic, so the invert falls back
            # to the XLA blend + fiber-roll path (traces polymorphically)
            and isinstance(B, int)
            and H == W
            and len(_c_n_decomposition(num_rotations, 1.0)[0]) <= 4
        )
        if fused_ok and rotation_onehot is None:
            # fused pallas pass: spatial rotate-select (+ hard hflip for
            # D_n) + fiber roll in one kernel (the roll is a per-sample
            # channel permutation riding the kernel's plane indexing —
            # bit-identical to the separate roll_by_gather pass it
            # replaces). Eval path: hard selection, no gradient needed.
            # Exact mode rides the same kernel with static-tap residual
            # sources (round-4: previously exact eval paid the 2|G|-trip
            # blend + a separate roll pass for proven-equal output).
            from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select

            shift_i = (rotation_deg / 360.0 * num_rotations).astype(jnp.int32)
            refl_i = (
                None
                if reflection is None
                else jnp.round(reflection).astype(jnp.int32)
            )
            return rotate_roll_select(
                feature_map, idx, shift_i, num_rotations, 1.0, "zeros",
                refl=refl_i, mode=mode,
            )
        if fused_ok and rotation_onehot is not None and mode == "fast":
            # training path: same single-pass kernel forward (ST one-hot
            # forward values are hard) with custom-VJP angle-pathway
            # gradients — replaces the 2|G|-traffic blend + roll
            return invert_regular_fast_diff(
                feature_map, rotation_onehot, reflection, num_rotations
            )
        x_out = _rot(feature_map)
        if reflection is not None:
            r = reflection[:, None, None, None]
            x_out = (1.0 - r) * x_out + r * hflip(x_out)
        x_out = x_out.reshape(B, H, W, C // num_group, num_group)
        shift = rotation_deg / 360.0 * num_rotations
        if reflection is not None:
            rot_f = roll_by_gather(x_out[..., :num_rotations], shift)
            ref_f = roll_by_gather(x_out[..., num_rotations:], -shift)
            x_out = jnp.concatenate([rot_f, ref_f], axis=-1)
        else:
            x_out = roll_by_gather(x_out, shift)
        return x_out.reshape(B, H, W, C)
    if induced_rep_type == "scalar":
        x_out = _rot(feature_map)
        if reflection is not None:
            r = reflection[:, None, None, None]
            x_out = (1.0 - r) * x_out + r * hflip(x_out)
        return x_out
    if induced_rep_type == "vector":
        # Implemented here although the reference leaves it
        # NotImplementedError (images/utils.py:90-92): a vector field
        # transforms as v'(x) = R(theta) v(R(-theta) x) — spatial rotate,
        # then mix channel 2-vector pairs [2f, 2f+1] = (v_x, v_y) by the
        # same rotation. Rotation-only groups (a reflection's action on a
        # vector field needs an orientation convention the reference never
        # fixed either).
        if reflection is not None:
            raise NotImplementedError(
                "vector rep under reflections needs an orientation convention"
            )
        if C % 2 != 0:
            raise ValueError(f"vector rep needs even channels, got {C}")
        x_out = _rot(feature_map)
        rad = jnp.deg2rad(rotation_deg).astype(x_out.dtype)
        cos = jnp.cos(rad)[:, None, None, None]
        sin = jnp.sin(rad)[:, None, None, None]
        v = x_out.reshape(B, H, W, C // 2, 2)
        vx, vy = v[..., 0], v[..., 1]
        v_rot = jnp.stack(
            [cos * vx - sin * vy, sin * vx + cos * vy], axis=-1
        )
        return v_rot.reshape(B, H, W, C)
    raise ValueError("induced_rep_type must be regular, scalar or vector")
