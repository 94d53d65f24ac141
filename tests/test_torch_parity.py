"""Torch-oracle parity fixtures (BASELINE.md functional-parity bar).

The bar: identical selected group elements and fp32-tolerance-matched
canonicalized tensors vs the reference's torch semantics. kornia/e2cnn are
not installed, but kornia's rotate is F.affine_grid + F.grid_sample
underneath (pure rotation about the image center, align_corners=False),
so the oracles here are built from torch primitives directly:

* `rotate` vs the affine-grid oracle at arbitrary per-sample angles,
  zeros and border padding (reference discrete_group.py:213 / kornia).
* The edge-pad -> rotate -> center-crop sandwich (reference
  discrete_group.py:207-215) vs our border-clamped single warp.
* `roll_by_gather` vs the reference's modular-gather semantics
  (reference images/utils.py:8-29), including the roto-reflection split
  (:68-77) via get_action_on_image_features.
* Full discrete canonicalize path with SHARED weights: lift-conv energy
  network -> argmax selection -> warp, jax vs an independent torch replica.
  Elements must be identical, canonical tensors fp32-close.

These run on every backend (conftest forces the 8-device CPU mesh).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from equiadapt_tpu.images.networks.group_conv import (  # noqa: E402
    RotationEquivariantConvLift,
)
from equiadapt_tpu.ops.group_action import (  # noqa: E402
    get_action_on_image_features,
    roll_by_gather,
)
from equiadapt_tpu.ops.warp import group_angles, rotate, rotate_discrete  # noqa: E402


def torch_rotate(x: "torch.Tensor", angles_deg: "torch.Tensor",
                 padding_mode: str = "zeros") -> "torch.Tensor":
    """kornia-equivalent rotate for square images: pure rotation about the
    center via F.affine_grid/F.grid_sample (align_corners=False). For square
    inputs the normalized-coordinate rotation equals the pixel-space rotation
    about ((W-1)/2, (H-1)/2) — kornia's convention."""
    b, c, h, w = x.shape
    assert h == w
    rad = angles_deg * np.pi / 180.0
    cos, sin = torch.cos(rad), torch.sin(rad)
    theta = torch.zeros(b, 2, 3, dtype=x.dtype)
    theta[:, 0, 0] = cos
    theta[:, 0, 1] = -sin
    theta[:, 1, 0] = sin
    theta[:, 1, 1] = cos
    grid = F.affine_grid(theta, [b, c, h, w], align_corners=False)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode=padding_mode,
                         align_corners=False)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_rotate_matches_torch_oracle_arbitrary_angles(padding):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(5, 32, 32, 3)).astype(np.float32)
    angles = np.asarray([17.0, 45.0, 123.4, -60.0, 284.9], np.float32)
    ours = rotate(jnp.asarray(x), jnp.asarray(angles), padding_mode=padding)
    theirs = torch_rotate(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(angles),
        padding_mode="reflection" if padding == "reflect" else padding,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


def test_pad_rotate_crop_sandwich_equals_border_warp():
    """The reference's pad(edge, W//2) -> rotate -> center-crop chain
    (discrete_group.py:207-215), done in torch, equals our single
    border-clamped warp."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    angles = np.asarray([45.0, 90.0, 17.3, 315.0], np.float32)
    pad = 16
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    tp = F.pad(tx, (pad, pad, pad, pad), mode="replicate")
    tr = torch_rotate(tp, torch.tensor(-angles))
    theirs = tr[:, :, pad:pad + 32, pad:pad + 32].permute(0, 2, 3, 1).numpy()
    ours = rotate(jnp.asarray(x), jnp.asarray(-angles), padding_mode="border")
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


def _torch_roll_by_gather(fm: "torch.Tensor", shifts: "torch.Tensor"):
    """Reference roll_by_gather semantics (images/utils.py:8-29): feature map
    (B, C, G, H, W); output fiber g reads input fiber (g - shift) mod G,
    shifts truncated toward zero like `.long()`."""
    b, c, g, h, w = fm.shape
    ar = torch.arange(g).view(1, 1, g, 1, 1).expand(b, c, g, h, w)
    idx = (ar - shifts.long().view(b, 1, 1, 1, 1)) % g
    return torch.gather(fm, 2, idx)


def test_roll_by_gather_matches_reference_semantics():
    rng = np.random.default_rng(2)
    G = 8
    fm = rng.normal(size=(6, 4, 4, 3, G)).astype(np.float32)  # B,H,W,C,G
    shifts = np.asarray([0, 1, 3, 7, 5, 2], np.float32)
    ours = roll_by_gather(jnp.asarray(fm), jnp.asarray(shifts))
    tfm = torch.tensor(fm).permute(0, 3, 4, 1, 2)  # B,C,G,H,W
    theirs = _torch_roll_by_gather(tfm, torch.tensor(shifts))
    theirs = theirs.permute(0, 3, 4, 1, 2).numpy()  # back to B,H,W,C,G
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=0)


def test_regular_rep_invert_matches_torch_composition():
    """get_action_on_image_features (regular rep, C_n): rotate(+theta) then
    fiber roll — against the torch composition of the two oracles
    (reference images/utils.py:54-79)."""
    rng = np.random.default_rng(3)
    G = 4
    B, H, W, C = 5, 16, 16, 8  # C = 2 fields x |G|
    fm = rng.normal(size=(B, H, W, C)).astype(np.float32)
    idx = np.asarray([0, 1, 2, 3, 2])
    angles = idx * (360.0 / G)
    ours = get_action_on_image_features(
        jnp.asarray(fm), num_rotations=G, num_group=G,
        rotation_deg=jnp.asarray(angles.astype(np.float32)),
        induced_rep_type="regular",
    )
    t = torch.tensor(fm).permute(0, 3, 1, 2)
    tr = torch_rotate(t, torch.tensor(angles.astype(np.float32)))
    trr = tr.reshape(B, C // G, G, H, W)
    shift = torch.tensor(angles / 360.0 * G)
    theirs = _torch_roll_by_gather(trr, shift).reshape(B, C, H, W)
    theirs = theirs.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)


class _SharedWeightReplica:
    """Torch replica of the C8 lift-conv energy net + canonicalize path,
    built from the SAME weights as the jax module (layout transposed)."""

    def __init__(self, w_kkio: np.ndarray, bias: np.ndarray, num_rotations: int):
        self.G = num_rotations
        K, _, Ci, Co = w_kkio.shape
        self.K, self.Ci, self.Co = K, Ci, Co
        self.w = torch.tensor(w_kkio)  # (K, K, Ci, Co)
        self.bias = torch.tensor(bias)

    def activations(self, x: "torch.Tensor") -> "torch.Tensor":
        G, K, Ci, Co = self.G, self.K, self.Ci, self.Co
        angles = torch.linspace(0.0, 360.0, G + 1)[:G]
        # rotate the filter bank: (G, K, K, Ci*Co) images, NCHW for the oracle
        flat = self.w.reshape(K, K, Ci * Co).permute(2, 0, 1)[None]  # 1,CiCo,K,K
        tiled = flat.expand(G, Ci * Co, K, K)
        rot = torch_rotate(tiled, angles)  # zeros padding
        # -> OIHW with out channel index c*G + g (C-major/G-minor)
        bank = rot.reshape(G, Ci, Co, K, K).permute(2, 0, 1, 3, 4)
        bank = bank.reshape(Co * G, Ci, K, K)
        h = F.conv2d(x, bank, bias=self.bias.repeat_interleave(G))
        b = h.shape[0]
        return h.reshape(b, Co, G, h.shape[-2], h.shape[-1]).mean(dim=(1, 3, 4))

    def canonicalize(self, x: "torch.Tensor"):
        acts = self.activations(x)
        idx = acts.argmax(dim=-1)
        theta = torch.linspace(0.0, 360.0, self.G + 1)[:self.G][idx]
        pad = x.shape[-1] // 2
        xp = F.pad(x, (pad, pad, pad, pad), mode="replicate")
        xr = torch_rotate(xp, -theta)
        return idx, xr[:, :, pad:pad + x.shape[-2], pad:pad + x.shape[-1]]


def test_full_discrete_canonicalize_path_torch_parity():
    """Shared-weight C8 path: identical selected elements, fp32-close
    canonical tensors (the BASELINE.md parity bar)."""
    rng = np.random.default_rng(4)
    B, S, G = 6, 32, 8
    x = rng.normal(size=(B, S, S, 3)).astype(np.float32)

    lift = RotationEquivariantConvLift(
        in_channels=3, out_channels=4, kernel_size=3, num_rotations=G
    )
    params = lift.init(jax.random.key(0), jnp.asarray(x))
    w = np.asarray(params["params"]["weights"])  # (K,K,Ci,Co)
    bias = np.asarray(params["params"]["bias"])

    # jax side: lift -> fiber mean -> hard argmax -> border warp
    y = lift.apply(params, jnp.asarray(x))
    Bq, Hq, Wq, CG = y.shape
    acts = jnp.mean(y.reshape(Bq, Hq * Wq, CG // G, G), axis=(1, 2))
    idx = jnp.argmax(acts, axis=-1)
    onehot = jax.nn.one_hot(idx, G, dtype=x.dtype)
    x_canon = rotate_discrete(jnp.asarray(x), onehot, G, sign=-1.0,
                              padding_mode="border")

    replica = _SharedWeightReplica(w, bias, G)
    with torch.no_grad():
        t_acts = replica.activations(torch.tensor(x).permute(0, 3, 1, 2))
        t_idx, t_canon = replica.canonicalize(torch.tensor(x).permute(0, 3, 1, 2))

    np.testing.assert_allclose(np.asarray(acts), t_acts.numpy(), atol=1e-4)
    # the element comparison is meaningful only where the selection margin
    # dominates the activation tolerance; sub-tolerance ties are coin flips
    # in both frameworks
    srt = np.sort(np.asarray(acts), axis=-1)
    confident = (srt[:, -1] - srt[:, -2]) > 1e-3
    assert confident.sum() >= 3, f"too few confident samples: {srt[:, -1] - srt[:, -2]}"
    np.testing.assert_array_equal(
        np.asarray(idx)[confident], t_idx.numpy()[confident]
    )
    diff = np.abs(
        np.asarray(x_canon) - t_canon.permute(0, 2, 3, 1).numpy()
    ).max(axis=(1, 2, 3))
    assert (diff[confident] < 2e-4).all(), diff


def torch_rotate_rect(x: "torch.Tensor", angles_deg: "torch.Tensor",
                      padding_mode: str = "zeros") -> "torch.Tensor":
    """Pixel-space rotation oracle valid for NON-square images: build the
    sampling grid in pixel coordinates about ((W-1)/2, (H-1)/2) (kornia's
    center) and normalize for grid_sample(align_corners=False). The
    normalized-affine shortcut in `torch_rotate` only equals this on
    squares."""
    b, c, h, w = x.shape
    rad = (angles_deg * np.pi / 180.0).view(b, 1, 1)
    cos, sin = torch.cos(rad), torch.sin(rad)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ys = torch.arange(h, dtype=x.dtype)
    xs = torch.arange(w, dtype=x.dtype)
    gy, gx = torch.meshgrid(ys, xs, indexing="ij")
    dx, dy = gx[None] - cx, gy[None] - cy
    sx = cos * dx - sin * dy + cx
    sy = sin * dx + cos * dy + cy
    nx = (2.0 * sx + 1.0) / w - 1.0
    ny = (2.0 * sy + 1.0) / h - 1.0
    grid = torch.stack([nx, ny], dim=-1)
    return F.grid_sample(x, grid, mode="bilinear", padding_mode=padding_mode,
                         align_corners=False)


@pytest.mark.parametrize("padding", ["zeros", "border"])
def test_rotate_matches_torch_oracle_non_square(padding):
    """VERDICT round-2 item 5: the square-equivalence argument left
    non-square images untested against a torch oracle."""
    rng = np.random.default_rng(10)
    x = rng.normal(size=(4, 24, 40, 3)).astype(np.float32)
    angles = np.asarray([33.0, -75.5, 145.0, 262.1], np.float32)
    ours = rotate(jnp.asarray(x), jnp.asarray(angles), padding_mode=padding)
    theirs = torch_rotate_rect(
        torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(angles),
        padding_mode=padding,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


def test_optimized_canonicalizer_shared_weight_parity():
    """Optimized (orbit + reference-vector) path with shared weights:
    identical selected elements and fp32-close canonical tensors vs an
    independent torch replica of the orbit/cosine machinery
    (reference discrete_group.py:320-512)."""
    import flax.linen as nn

    from equiadapt_tpu.images.canonicalization.discrete_group import (
        OptimizedGroupEquivariantImageCanonicalization,
    )

    G, B, S, D = 8, 5, 32, 16
    rng = np.random.default_rng(11)
    x = rng.normal(size=(B, S, S, 3)).astype(np.float32)

    class LinearVec(nn.Module):
        @nn.compact
        def __call__(self, z, training=False):
            return nn.Dense(D, use_bias=False)(z.reshape(z.shape[0], -1))

    canon = OptimizedGroupEquivariantImageCanonicalization(
        canonicalization_network=LinearVec(), in_shape=(S, S, 3),
        num_rotations=G, group_type="rotation", out_vector_size=D,
    )
    variables = canon.init(jax.random.key(1), jnp.asarray(x), training=False)
    x_canon, info = canon.apply(variables, jnp.asarray(x), training=False)
    acts = np.asarray(info.group_activations)
    idx = np.asarray(info.onehot.argmax(-1))

    Wv = np.asarray(variables["params"]["canonicalization_network"]["Dense_0"]["kernel"])
    ref = np.asarray(variables["params"]["reference_vector"])
    angles = np.linspace(0.0, 360.0, G + 1)[:G].astype(np.float32)
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    pad = S // 2
    t_acts = []
    for g in range(G):
        xp = F.pad(tx, (pad, pad, pad, pad), mode="replicate")
        xr = torch_rotate(xp, torch.full((B,), -angles[g]))
        xg = xr[:, :, pad:pad + S, pad:pad + S]
        flat = xg.permute(0, 2, 3, 1).reshape(B, -1).numpy()
        v = flat @ Wv
        vn = v / (np.linalg.norm(v, axis=-1, keepdims=True) + 1e-12)
        rn = ref / (np.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
        t_acts.append((vn * rn).sum(-1))
    t_acts = np.stack(t_acts, axis=1)  # (B, G)
    np.testing.assert_allclose(acts, t_acts, atol=2e-4)
    srt = np.sort(t_acts, axis=-1)
    confident = (srt[:, -1] - srt[:, -2]) > 1e-3
    assert confident.sum() >= 3
    np.testing.assert_array_equal(idx[confident], t_acts.argmax(-1)[confident])
    # canonical image: pad -> rotate(-theta_sel) -> crop in torch
    theta_sel = torch.tensor(angles)[torch.tensor(idx)]
    xp = F.pad(tx, (pad, pad, pad, pad), mode="replicate")
    xr = torch_rotate(xp, -theta_sel)
    t_canon = xr[:, :, pad:pad + S, pad:pad + S].permute(0, 2, 3, 1).numpy()
    diff = np.abs(np.asarray(x_canon) - t_canon).max(axis=(1, 2, 3))
    assert (diff[confident] < 2e-4).all(), diff


def test_one_train_step_gradient_parity_discrete():
    """One training-step gradient parity on the discrete path: shared
    lift-conv weights, straight-through selection, blend warp, task +
    prior losses — d loss / d weights matches an independent torch replica
    of the same estimator to fp32 tolerance (VERDICT round-2 item 5)."""
    G, B, S = 4, 4, 16
    rng = np.random.default_rng(12)
    x = rng.normal(size=(B, S, S, 3)).astype(np.float32)
    task_w = rng.normal(size=(B, S, S, 3)).astype(np.float32)

    lift = RotationEquivariantConvLift(
        in_channels=3, out_channels=4, kernel_size=3, num_rotations=G
    )
    params = lift.init(jax.random.key(2), jnp.asarray(x))
    w0 = np.asarray(params["params"]["weights"])
    b0 = np.asarray(params["params"]["bias"])

    def jax_loss(p):
        y = lift.apply({"params": p}, jnp.asarray(x))
        Bq, Hq, Wq, CG = y.shape
        acts = jnp.mean(y.reshape(Bq, Hq * Wq, CG // G, G), axis=(1, 2))
        from equiadapt_tpu.common.selector import straight_through_onehot

        onehot = straight_through_onehot(acts, beta=1.0, training=True)
        x_c = rotate_discrete(jnp.asarray(x), onehot, G, sign=-1.0,
                              padding_mode="border")
        task = jnp.sum(x_c * jnp.asarray(task_w))
        prior = -jnp.mean(jax.nn.log_softmax(acts, -1)[:, 0])
        return task + 100.0 * prior

    gj = jax.grad(jax_loss)({"weights": jnp.asarray(w0), "bias": jnp.asarray(b0)})

    # torch replica of the same estimator
    tw = torch.tensor(w0, requires_grad=True)
    tb = torch.tensor(b0, requires_grad=True)
    angles = torch.linspace(0.0, 360.0, G + 1)[:G]
    K, _, Ci, Co = w0.shape
    flat = tw.reshape(K, K, Ci * Co).permute(2, 0, 1)[None].expand(G, Ci * Co, K, K)
    rot = torch_rotate(flat, angles)
    bank = rot.reshape(G, Ci, Co, K, K).permute(2, 0, 1, 3, 4).reshape(Co * G, Ci, K, K)
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    h = F.conv2d(tx, bank, bias=tb.repeat_interleave(G))
    acts_t = h.reshape(B, Co, G, h.shape[-2], h.shape[-1]).mean(dim=(1, 3, 4))
    soft = torch.softmax(acts_t, dim=-1)
    hard = torch.nn.functional.one_hot(acts_t.argmax(-1), G).to(soft.dtype)
    onehot_t = hard + soft - soft.detach()
    pad = S // 2
    xp = F.pad(tx, (pad, pad, pad, pad), mode="replicate")
    cands = [
        torch_rotate(xp, torch.full((B,), -float(angles[g])))[
            :, :, pad:pad + S, pad:pad + S
        ]
        for g in range(G)
    ]
    x_ct = sum(onehot_t[:, g].view(B, 1, 1, 1) * cands[g] for g in range(G))
    task_t = (x_ct * torch.tensor(task_w).permute(0, 3, 1, 2)).sum()
    prior_t = -torch.log_softmax(acts_t, dim=-1)[:, 0].mean()
    (task_t + 100.0 * prior_t).backward()

    gw = np.asarray(gj["weights"])
    gb = np.asarray(gj["bias"])
    scale = max(np.abs(tw.grad.numpy()).max(), 1.0)
    np.testing.assert_allclose(gw / scale, tw.grad.numpy() / scale, atol=5e-4)
    np.testing.assert_allclose(gb, tb.grad.numpy(), rtol=1e-3, atol=1e-3)
