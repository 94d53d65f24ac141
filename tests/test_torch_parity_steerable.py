"""Steerable (continuous SO(2)) family torch-oracle parity.

Round-4 verdict item 5: the discrete family had end-to-end shared-weight
torch parity, the steerable family only had property tests. Here the
whole continuous chain is pinned against an independent torch replica
with SHARED weights (both sides are self-built — e2cnn is not
installable — but the torch side re-derives the harmonic basis, kernel
assembly, norm layers, matrix construction, and warp from torch
primitives, so any convention drift between the frameworks shows up):

  circular-harmonic SteerableConv stack  -> matched output vectors
  rotmat_2d_from_vector                  -> matched rotation matrices
  SteerableImageCanonicalization (exact) -> fp32-matched canonical images
  one gradient step                      -> matched parameter gradients

Reference: continuous_group.py:233-311 (SteerableImageCanonicalization),
escnn_networks.py:120-224 (ESCNNSteerableNetwork contract).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from equiadapt_tpu.images.canonicalization.continuous_group import (  # noqa: E402
    SteerableImageCanonicalization,
)
from equiadapt_tpu.images.networks.steerable import SteerableNetwork  # noqa: E402

IN_CH, HID, K, NUM_VEC = 3, 2, 5, 2
IMG = 16


def _np_basis(kernel_size: int, dm: int) -> np.ndarray:
    """Independent reimplementation of the circular-harmonic ring basis
    (same math as steerable._harmonic_basis, re-derived here so a bug in
    the module's basis cannot cancel out of the comparison)."""
    Kk = kernel_size
    c = (Kk - 1) / 2.0
    ys, xs = np.mgrid[0:Kk, 0:Kk].astype(np.float64)
    r = np.hypot(xs - c, ys - c)
    phi = np.arctan2(-(ys - c), xs - c)
    rings = []
    for j in range(0 if dm == 0 else 1, Kk // 2 + 1):
        radial = np.exp(-((r - j) ** 2) / (2 * 0.6**2))
        radial[r > Kk // 2 + 0.5] = 0.0
        if dm != 0:
            radial[r == 0.0] = 0.0
        re = radial * np.cos(dm * phi)
        im = radial * np.sin(dm * phi)
        n = np.sqrt((re**2 + im**2).sum()) + 1e-12
        rings.append(np.stack([re / n, im / n], axis=-1))
    return np.asarray(rings, dtype=np.float32)


def _field_channels(orders):
    return sum(1 if m == 0 else 2 for m in orders)


def _torch_kernel(conv_params, in_orders, out_orders, kernel_size):
    """Assemble the real OIHW kernel from (shared) ring coefficients."""
    Cin = _field_channels(in_orders)
    Cout = _field_channels(out_orders)
    kernel = torch.zeros(kernel_size, kernel_size, Cin, Cout)
    ci = 0
    for fi, mi in enumerate(in_orders):
        co = 0
        for fo, mo in enumerate(out_orders):
            coef = conv_params[f"w_{fo}_{fi}"]  # (J, 2) torch tensor
            basis = torch.tensor(_np_basis(kernel_size, mo - mi))
            k_re = torch.einsum("j,jhw->hw", coef[:, 0], basis[..., 0]) - \
                torch.einsum("j,jhw->hw", coef[:, 1], basis[..., 1])
            k_im = torch.einsum("j,jhw->hw", coef[:, 0], basis[..., 1]) + \
                torch.einsum("j,jhw->hw", coef[:, 1], basis[..., 0])
            if mi == 0 and mo == 0:
                kernel[:, :, ci, co] = kernel[:, :, ci, co] + k_re
            elif mi == 0:
                kernel[:, :, ci, co] = kernel[:, :, ci, co] + k_re
                kernel[:, :, ci, co + 1] = kernel[:, :, ci, co + 1] + k_im
            elif mo == 0:
                kernel[:, :, ci, co] = kernel[:, :, ci, co] + k_re
                kernel[:, :, ci + 1, co] = kernel[:, :, ci + 1, co] - k_im
            else:
                kernel[:, :, ci, co] = kernel[:, :, ci, co] + k_re
                kernel[:, :, ci + 1, co] = kernel[:, :, ci + 1, co] - k_im
                kernel[:, :, ci, co + 1] = kernel[:, :, ci, co + 1] + k_im
                kernel[:, :, ci + 1, co + 1] = kernel[:, :, ci + 1, co + 1] + k_re
            co += 1 if mo == 0 else 2
        ci += 1 if mi == 0 else 2
    return kernel.permute(3, 2, 0, 1)  # OIHW


def _torch_forward(x_nchw, tparams, batch_stats):
    """Torch replica of SteerableNetwork.__call__ (eval mode)."""
    in_orders = tuple([0] * IN_CH)
    hidden = tuple([0] * HID + [1] * HID + [2] * HID)
    h = x_nchw
    cur = in_orders
    # hidden block
    kern = _torch_kernel(tparams["SteerableConv_0"], cur, hidden, K)
    h = F.conv2d(h, kern)
    # NormBatchNorm (eval: divide by running stat)
    scale = tparams["NormBatchNorm_0"]["scale"]
    stats = batch_stats["NormBatchNorm_0"]["norm_sq"]
    outs, ci = [], 0
    for fi, m in enumerate(hidden):
        w = 1 if m == 0 else 2
        z = h[:, ci:ci + w]
        outs.append(z * scale[fi] / torch.sqrt(stats[fi] + 1e-5))
        ci += w
    h = torch.cat(outs, dim=1)
    # NormNonlinearity
    nl = tparams["NormNonlinearity_0"]
    outs, ci = [], 0
    for fi, m in enumerate(hidden):
        if m == 0:
            outs.append(F.gelu(h[:, ci:ci + 1], approximate="tanh"))
            ci += 1
        else:
            z = h[:, ci:ci + 2]
            norm = torch.sqrt((z * z).sum(dim=1, keepdim=True) + 1e-8)
            b = nl[f"bias_{fi}"]
            outs.append(F.relu(norm + b) * z / norm)
            ci += 2
    h = torch.cat(outs, dim=1)
    # output conv -> 2 x irrep(1)
    kern2 = _torch_kernel(
        tparams["SteerableConv_1"], hidden, tuple([1] * NUM_VEC), K
    )
    h = F.conv2d(h, kern2)
    v = h.mean(dim=(2, 3))  # (B, 2 * NUM_VEC)
    return v.reshape(v.shape[0], NUM_VEC, 2)


def _torch_rotmat(v):
    v1 = v / torch.sqrt((v * v).sum(-1, keepdim=True) + 0.0).clamp_min(1e-12)
    v2 = torch.stack([-v1[..., 1], v1[..., 0]], dim=-1)
    return torch.stack([v1, v2], dim=-2)


def _torch_warp_center(x_nchw, R, padding_mode="border"):
    """Torch replica of _warp_center_affine: sample src = R^{-1}(dst-c)+c
    about c = (H//2, W//2) — grid built in pixel space, resolved by
    grid_sample's bilinear (align_corners=True maps [-1,1] onto pixel
    centers 0..N-1, matching the pixel-coordinate formulation)."""
    b, c, h, w = x_nchw.shape
    cx, cy = h // 2, w // 2
    det = R[:, 0, 0] * R[:, 1, 1] - R[:, 0, 1] * R[:, 1, 0]
    i00, i01 = R[:, 1, 1] / det, -R[:, 0, 1] / det
    i10, i11 = -R[:, 1, 0] / det, R[:, 0, 0] / det
    gy, gx = torch.meshgrid(
        torch.arange(h, dtype=x_nchw.dtype),
        torch.arange(w, dtype=x_nchw.dtype),
        indexing="ij",
    )
    dx = gx[None] - cx
    dy = gy[None] - cy
    sx = i00[:, None, None] * dx + i01[:, None, None] * dy + cx
    sy = i10[:, None, None] * dx + i11[:, None, None] * dy + cy
    grid = torch.stack(
        [sx / (w - 1) * 2.0 - 1.0, sy / (h - 1) * 2.0 - 1.0], dim=-1
    )
    return F.grid_sample(
        x_nchw, grid, mode="bilinear", padding_mode=padding_mode,
        align_corners=True,
    )


def _shared_setup(seed=0):
    net = SteerableNetwork(
        in_channels=IN_CH, out_channels=HID, kernel_size=K, num_layers=1,
        num_vectors=NUM_VEC,
    )
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(4, IMG, IMG, IN_CH)).astype(np.float32)
    variables = net.init(jax.random.key(seed), jnp.asarray(x), training=False)
    # randomize the running norm stats so the batch-norm branch is
    # non-trivially exercised
    stats = rng.uniform(0.5, 2.0, size=(3 * HID,)).astype(np.float32)
    variables = jax.tree_util.tree_map(lambda a: a, variables)
    variables = {
        "params": variables["params"],
        "batch_stats": {"NormBatchNorm_0": {"norm_sq": jnp.asarray(stats)}},
    }

    def to_torch(tree):
        if isinstance(tree, dict) or hasattr(tree, "items"):
            return {k: to_torch(v) for k, v in tree.items()}
        return torch.tensor(np.asarray(tree))

    tparams = to_torch(variables["params"])
    tstats = to_torch(variables["batch_stats"])
    return net, variables, tparams, tstats, x


def test_steerable_network_vectors_match_torch():
    net, variables, tparams, tstats, x = _shared_setup()
    v_jax = net.apply(variables, jnp.asarray(x), training=False)
    v_torch = _torch_forward(
        torch.tensor(x).permute(0, 3, 1, 2), tparams, tstats
    ).numpy()
    np.testing.assert_allclose(
        np.asarray(v_jax), v_torch, rtol=1e-4, atol=1e-5
    )
    # matched rotation matrices from the first vector
    from equiadapt_tpu.common.math import rotmat_2d_from_vector

    R_jax = rotmat_2d_from_vector(v_jax[:, 0])
    R_torch = _torch_rotmat(torch.tensor(v_torch)[:, 0]).numpy()
    np.testing.assert_allclose(np.asarray(R_jax), R_torch, rtol=1e-4, atol=1e-5)


def test_steerable_canonicalize_matches_torch():
    """End-to-end: canonicalize (exact warp mode) == torch replica chain
    (network -> rotation matrix -> transpose trick -> center warp)."""
    net, variables, tparams, tstats, x = _shared_setup(seed=1)
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(IMG, IMG, IN_CH),
        warp_mode="exact",
    )
    cv = canon.init(jax.random.key(9), jnp.asarray(x), training=False)
    cv = {
        "params": {"canonicalization_network": variables["params"]},
        "batch_stats": {
            "canonicalization_network": variables["batch_stats"]
        },
    }
    x_canon, info = canon.apply(cv, jnp.asarray(x), training=False)

    tx = torch.tensor(x).permute(0, 3, 1, 2)
    v = _torch_forward(tx, tparams, tstats)
    R = _torch_rotmat(v[:, 0])
    np.testing.assert_allclose(
        np.asarray(info.element.rotation), R.numpy(), rtol=1e-4, atol=1e-5
    )
    flip = torch.tensor([[1.0, -1.0], [-1.0, 1.0]])
    R_inv = R * flip
    y = _torch_warp_center(tx, R_inv, "border").permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(x_canon), y, rtol=1e-4, atol=2e-5)


def test_steerable_one_step_gradient_parity():
    """d loss / d (final-conv ring coefficients) matches torch autograd for
    loss = mean(canonical^2) + prior MSE(matrix, I) — gradients flow
    through the warp, the matrix build, and the harmonic conv stack in
    both frameworks."""
    net, variables, tparams, tstats, x = _shared_setup(seed=2)
    canon = SteerableImageCanonicalization(
        canonicalization_network=net, in_shape=(IMG, IMG, IN_CH),
        warp_mode="exact",
    )
    cv = {
        "params": {"canonicalization_network": variables["params"]},
        "batch_stats": {
            "canonicalization_network": variables["batch_stats"]
        },
    }

    def loss_jax(params):
        full = {"params": params, "batch_stats": cv["batch_stats"]}
        x_c, info = canon.apply(full, jnp.asarray(x), training=False)
        prior = jnp.mean(
            (info.matrix_rep - jnp.eye(2, dtype=info.matrix_rep.dtype)) ** 2
        )
        return jnp.mean(x_c**2) + prior

    g = jax.grad(loss_jax)(cv["params"])
    g_final = g["canonicalization_network"]["SteerableConv_1"]

    # torch side
    for d in tparams["SteerableConv_1"].values():
        d.requires_grad_(True)
    tx = torch.tensor(x).permute(0, 3, 1, 2)
    v = _torch_forward(tx, tparams, tstats)
    R = _torch_rotmat(v[:, 0])
    flip = torch.tensor([[1.0, -1.0], [-1.0, 1.0]])
    y = _torch_warp_center(tx, R * flip, "border")
    loss_t = (y**2).mean() + ((R - torch.eye(2)) ** 2).mean()
    loss_t.backward()
    for name, gj in g_final.items():
        gt = tparams["SteerableConv_1"][name].grad.numpy()
        np.testing.assert_allclose(
            np.asarray(gj), gt, rtol=2e-3, atol=1e-5, err_msg=name
        )
