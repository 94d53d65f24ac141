"""North-star benchmark: canonicalize + invert throughput at 224px, C8.

Measures the BASELINE.md driver metric — images/sec/chip through the full
discrete canonicalization path (C8 group-equivariant energy network ->
straight-through element selection -> inverse-rotation warp) plus
invert_canonicalization of a regular-rep output feature map — on the
default JAX device (the real TPU chip under the driver).

Baseline: a fresh torch-CPU implementation of the same algorithm the
reference executes (pad/edge -> grid_sample rotation -> crop; rotated-filter
lift conv; fiber roll via gather), timed at a smaller batch and normalized
to images/sec (BASELINE.md "proxies to measure ourselves"; the reference
itself cannot run here — kornia/e2cnn are not installed — and kornia's
rotate is grid_sample underneath).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

IMAGE = 224
NUM_ROT = 8
BATCH_TPU = 64
BATCH_TORCH = 8
FEATURE_CH = 16  # regular-rep output channels for invert (2 fields x |G|)


def bench_jax() -> float:
    import jax

    # persistent compile cache: the axon remote-compile service has highly
    # variable queueing latency; cache hits make repeat bench runs fast
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp

    from equiadapt_tpu.images import (
        EquivariantNetwork,
        GroupEquivariantImageCanonicalization,
    )

    from equiadapt_tpu.common.selector import straight_through_onehot
    from equiadapt_tpu.ops.group_action import get_action_on_image_features
    from equiadapt_tpu.ops.warp import (
        center_crop,
        group_angles,
        resize,
        rotate_discrete,
    )

    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=NUM_ROT, num_layers=2,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH_TPU, IMAGE, IMAGE, 3)).astype(np.float32))
    y = jnp.asarray(
        rng.normal(size=(BATCH_TPU, IMAGE, IMAGE, FEATURE_CH)).astype(np.float32)
    )
    small = jnp.zeros((BATCH_TPU, 64, 64, 3), jnp.float32)
    # jit the init too: eager per-op dispatch is pathologically slow through
    # the axon tunnel
    params = jax.jit(net.init)(jax.random.key(0), small)

    # IMPORTANT: params are passed as jit *arguments*, never closed over.
    # Closed-over params become baked HLO constants, which on the axon
    # toolchain cause minutes-long remote compiles and flip the runtime
    # into a mode where subsequent gather programs run ~100x slower.
    crop = int(np.ceil(IMAGE * 0.9))

    @jax.jit
    def step_fn(params, x, y, i):
        # fold the iteration index in: defeats any runtime result caching
        x = x + i * 1e-9
        s = resize(center_crop(x, (crop, crop)), (64, 64))
        acts = net.apply(params, s)
        onehot = straight_through_onehot(acts, training=False)
        ang = jnp.sum(onehot * group_angles(NUM_ROT), -1)
        # production path: differentiable blend for canonicalize, hard
        # single-pass pallas select for invert (reference invert is hard too)
        x_c = rotate_discrete(x, onehot, NUM_ROT, sign=-1.0, padding_mode="border")
        y_inv = get_action_on_image_features(
            y, num_rotations=NUM_ROT, num_group=NUM_ROT,
            rotation_deg=ang, induced_rep_type="regular",
        )
        return x_c, y_inv

    # warmup + timing: iterations are *chained* (each step consumes the
    # previous step's outputs) and completion is forced by fetching a
    # dependent scalar — on this runtime block_until_ready returns at
    # enqueue-ack, so only a host fetch proves the device finished
    reduce_fn = jax.jit(lambda a, b: jnp.sum(a) + jnp.sum(b))
    x_c, y_inv = step_fn(params, x, y, jnp.float32(0))
    float(reduce_fn(x_c, y_inv))  # warm + sync
    iters = 10
    t0 = time.perf_counter()
    for k in range(iters):
        x_c, y_inv = step_fn(params, x_c, y_inv, jnp.float32(k + 1))
    float(reduce_fn(x_c, y_inv))
    dt = (time.perf_counter() - t0) / iters
    return BATCH_TPU / dt


def bench_torch_cpu() -> float:
    """Reference-style torch-CPU implementation of the same path."""
    import torch
    import torch.nn.functional as F

    torch.set_num_threads(max(torch.get_num_threads(), 4))
    G = NUM_ROT
    B = BATCH_TORCH

    def rotate(x: torch.Tensor, angles_deg: torch.Tensor) -> torch.Tensor:
        """kornia-style rotate: affine grid about the image center."""
        b, c, h, w = x.shape
        rad = angles_deg * np.pi / 180.0
        cos, sin = torch.cos(rad), torch.sin(rad)
        theta = torch.zeros(b, 2, 3)
        theta[:, 0, 0] = cos
        theta[:, 0, 1] = -sin
        theta[:, 1, 0] = sin
        theta[:, 1, 1] = cos
        grid = F.affine_grid(theta, [b, c, h, w], align_corners=False)
        return F.grid_sample(x, grid, align_corners=False)

    angles = torch.linspace(0.0, 360.0, G + 1)[:G]

    # tiny C8 GCNN energy net: lift conv with rotated filters + 1x1 group conv
    w_lift = torch.randn(8, 3, 3, 3) * 0.1
    w_gg = torch.randn(8 * G, 8 * G, 1, 1) * 0.1

    def energy_net(x: torch.Tensor) -> torch.Tensor:
        flat = w_lift.reshape(1, 24, 3, 3).repeat(G, 1, 1, 1)
        rot_w = rotate(flat, -angles).reshape(G, 8, 3, 3, 3)
        bank = rot_w.permute(1, 0, 2, 3, 4).reshape(8 * G, 3, 3, 3)
        h = F.conv2d(x, bank)
        h = F.relu(h)
        h = F.conv2d(h, w_gg)
        b = h.shape[0]
        return h.reshape(b, 8, G, h.shape[-2], h.shape[-1]).mean(dim=(1, 3, 4))

    pad = IMAGE // 2

    def canonicalize_invert(x: torch.Tensor, y: torch.Tensor):
        # pre-transform: center crop 0.9 + resize 64 (like the jax side)
        ch = int(np.ceil(IMAGE * 0.9))
        off = (IMAGE - ch) // 2
        xc = x[:, :, off : off + ch, off : off + ch]
        xc = F.interpolate(xc, size=(64, 64), mode="bilinear", align_corners=False)
        acts = energy_net(xc)
        idx = acts.argmax(dim=-1)
        theta = angles[idx]
        # canonicalize: edge pad -> rotate -> crop
        xp = F.pad(x, (pad, pad, pad, pad), mode="replicate")
        xr = rotate(xp, -theta)
        x_canon = xr[:, :, pad : pad + IMAGE, pad : pad + IMAGE]
        # invert a regular-rep feature map: rotate + fiber roll
        yr = rotate(y, theta)
        b, c, h, w = yr.shape
        yr = yr.reshape(b, c // G, G, h, w)
        shift = (idx.float() / 360.0 * G * (360.0 / G)).long()
        ar = torch.arange(G).view(1, 1, G, 1, 1).expand(b, c // G, G, h, w)
        gather_idx = (ar - shift.view(b, 1, 1, 1, 1)) % G
        y_out = torch.gather(yr, 2, gather_idx).reshape(b, c, h, w)
        return x_canon, y_out

    x = torch.randn(B, 3, IMAGE, IMAGE)
    y = torch.randn(B, FEATURE_CH, IMAGE, IMAGE)
    with torch.no_grad():
        canonicalize_invert(x, y)  # warmup
        iters = 3
        t0 = time.perf_counter()
        for _ in range(iters):
            canonicalize_invert(x, y)
        dt = (time.perf_counter() - t0) / iters
    return B / dt


def main() -> None:
    jax_ips = bench_jax()
    try:
        torch_ips = bench_torch_cpu()
    except Exception as e:  # torch missing or OOM: report absolute only
        print(f"torch baseline failed: {e}", file=sys.stderr)
        torch_ips = float("nan")
    vs = jax_ips / torch_ips if torch_ips == torch_ips else None
    print(
        json.dumps(
            {
                "metric": "canonicalize+invert images/sec/chip @224px C8",
                "value": round(jax_ips, 2),
                "unit": "images/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
