"""North-star benchmark: canonicalize + invert throughput and wrapper
overhead at 224px, C8, batch 256 (BASELINE.md north-star shape).

Two production-relevant variants are measured through the real library path
(GroupEquivariantImageCanonicalization + ResNet-50):

* fast/bf16 — warp_mode="fast" (two-pass MXU residual warps,
  ops/warp.rotate_twopass) with bf16 compute: the production serving mode.
* exact/fp32 — warp_mode="exact" (static-tap 4-tap warps, torch-parity
  numerics): the reference-parity mode.

Baseline: a fresh torch-CPU implementation of the same algorithm the
reference executes (pad/edge -> grid_sample rotation -> crop; rotated-filter
lift conv; fiber roll via gather), timed at a smaller batch and normalized
to images/sec (BASELINE.md "proxies to measure ourselves"; the reference
itself cannot run here — kornia/e2cnn are not installed — and kornia's
rotate is grid_sample underneath).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...} where
the extra keys carry the wrapper-overhead percentages the driver tracks
(BASELINE.json names both the throughput and the <5% overhead north stars).

Timing methodology (docs/benchmarking.md): params as jit arguments (never
closed over), iterations chained through a scalar data dependency, one host
fetch at the end, several discarded warm rounds.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

IMAGE = 224
NUM_ROT = 8
BATCH_TPU = 256
BATCH_TORCH = 8
FEATURE_CH = 16  # regular-rep output channels for invert (2 fields x |G|)
RESIZE = 64
CROP_RATIO = 0.9
N_LOOP = 24  # in-device iterations per timing call (see timed_ms)
# skip the end-to-end train-step section when the eval sections already ate
# this much wall time (cold-cache compile protection for the driver window)
TRAIN_BENCH_BUDGET_S = 420.0


def bench_jax() -> dict:
    t_start = time.perf_counter()
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
    from equiadapt_tpu.models import ResNet50
    from equiadapt_tpu.ops.group_action import get_action_on_image_features

    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=NUM_ROT, num_layers=2,
    )

    def make_canon(mode, dtype):
        return GroupEquivariantImageCanonicalization(
            canonicalization_network=net, in_shape=(IMAGE, IMAGE, 3),
            input_crop_ratio=CROP_RATIO, resize_shape=RESIZE,
            num_rotations=NUM_ROT, group_type="rotation",
            warp_mode=mode, compute_dtype=dtype,
        )

    canon_fast = make_canon("fast", jnp.bfloat16)
    canon_exact = make_canon("exact", None)
    # serving-mode energy config: fused-pool GCNN (exactly rot90-equivariant;
    # the 2x2/s2 avg pool is folded into the lift conv's filters so the
    # full-resolution lift output is never materialized —
    # images/networks/group_conv._fold_avg_pool); the exact path keeps the
    # reference-faithful unpooled stack
    net_pooled = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=NUM_ROT, num_layers=2, fused_pool_lift=True,
    )
    # Serving energy preset (round 4): no pre-crop + 56px field. 224->56 is
    # an integer 4x downsample, so the resize is one clean strided
    # contraction pair reading the NCHW spine tensor directly — the round-3
    # crop(0.9)+resize(64) chain cost a slice + relayout copy + two odd-
    # stride contractions (~0.4 ms of the energy's 0.73 ms, device-op
    # profile). input_crop_ratio/resize_shape are reference hyperparameters
    # (discrete_group.py:88-92) — this is a config choice, not a numerics
    # change; the exact/parity configuration keeps the reference defaults.
    canon_serving = GroupEquivariantImageCanonicalization(
        canonicalization_network=net_pooled, in_shape=(IMAGE, IMAGE, 3),
        input_crop_ratio=1.0, resize_shape=56,
        num_rotations=NUM_ROT, group_type="rotation",
        warp_mode="fast", compute_dtype=jnp.bfloat16, output_dtype="compute",
    )
    resnet_f32 = ResNet50(num_classes=10, small_images=False)
    resnet_bf16 = ResNet50(num_classes=10, small_images=False, dtype=jnp.bfloat16)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH_TPU, IMAGE, IMAGE, 3)).astype(np.float32))
    y = jnp.asarray(
        rng.normal(size=(BATCH_TPU, IMAGE, IMAGE, FEATURE_CH)).astype(np.float32)
    )
    small = jnp.zeros((2, IMAGE, IMAGE, 3), jnp.float32)
    # jit the inits: eager per-op dispatch is pathologically slow through
    # the axon tunnel
    canon_params = jax.jit(lambda k, s: canon_exact.init(k, s, training=False))(
        jax.random.key(0), small
    )
    res_params = jax.jit(lambda k, s: resnet_f32.init(k, s, training=False))(
        jax.random.key(1), small
    )

    def timed_ms(fn, *args, reps: int = 3) -> float:
        """Loop-amortized timing: the step runs N_LOOP times inside one jit
        via lax.fori_loop, so per-call host/tunnel jitter (±2 ms on this
        runtime) amortizes to ~±0.1 ms/iter.

        The step receives an int32 pool `slot` that depends on both the
        iteration counter and the loop carry; steps read their batch from a
        2-deep input pool via `lax.dynamic_index_in_dim`. This keeps every
        iteration's work live (nothing loop-invariant to hoist) WITHOUT
        doing arithmetic on the full-size input inside the loop: the
        round-3 `xx + it*1e-9` form materialized a full batch-size add
        whenever the step had more than one input consumer — fused away in
        the bare ResNet (one consumer) but charged to every canonicalize
        step (energy + warp read the input separately), inflating measured
        wrapper overhead by ~1 ms at 224px/batch 256 (profile-verified;
        docs/benchmarking.md)."""
        from jax import lax

        def run(seed, *a):
            def body(it, s):
                slot = (it + jnp.asarray(s * 0.0, jnp.int32)) % 2
                return fn(*a, slot) * 1e-6 + s * 1e-30

            return lax.fori_loop(0, N_LOOP, body, seed)

        f = jax.jit(run)
        s = f(jnp.float32(0.0), *args)
        float(s)  # compile + sync
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            s = f(s * 0.0, *args)
            float(s)
            best = min(best, (time.perf_counter() - t0) / N_LOOP * 1e3)
        return best

    def pool2(a: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
        """(2, ...) input pool: slot 1 is a slightly perturbed copy."""
        return jnp.stack([a, a + eps])

    def pick(pool, slot):
        from jax import lax

        return lax.dynamic_index_in_dim(pool, slot, axis=0, keepdims=False)

    def canon_invert(canon, mode):
        # y arrives pre-cast to the pipeline's compute dtype: in the serving
        # flow the inverted features are the *prediction network's output*,
        # which a bf16 pipeline produces in bf16 — timing an in-loop
        # fp32->bf16 cast of the (B, H, W, 16) tensor (822 MB fp32) would
        # charge the fast path ~1 ms of traffic that never exists end-to-end
        def step(cp, xps, yy, slot):
            xx = pick(xps, slot)
            x_c, info = canon.apply(cp, xx, training=False)
            y_inv = get_action_on_image_features(
                yy, num_rotations=NUM_ROT, num_group=NUM_ROT,
                rotation_deg=info.element.rotation_deg,
                induced_rep_type="regular", mode=mode,
            )
            return jnp.sum(x_c.astype(jnp.float32)) + jnp.sum(
                y_inv.astype(jnp.float32)
            )

        return step

    def bare(resnet):
        def step(rp, xps, slot):
            logits = resnet.apply(rp, pick(xps, slot), training=False)
            return jnp.sum(logits.astype(jnp.float32))

        return step

    def wrapped(canon, resnet):
        def step(cp, rp, xps, slot):
            x_c, _ = canon.apply(cp, pick(xps, slot), training=False)
            logits = resnet.apply(rp, x_c, training=False)
            return jnp.sum(logits.astype(jnp.float32))

        return step

    def cast_params(p):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p
        )

    res_params_bf16 = cast_params(res_params)

    # ---- on-hardware kernel equality checks (run every round) ----
    # pallas select kernel must be bit-identical to the blend path; the
    # shear kernel must be bit-identical to its interpret-mode reference.
    from equiadapt_tpu.ops.pallas.select_warp import _blend_ref, rotate_select
    from equiadapt_tpu.ops.pallas.shear_rotate import shear_rotate_residual
    from equiadapt_tpu.ops.warp import rotate_select_fast

    xs = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
    idx8 = jnp.asarray(rng.integers(0, NUM_ROT, size=(8,)).astype(np.int32))
    sel_pallas = rotate_select(xs, idx8, NUM_ROT, -1.0, "border")
    sel_blend = _blend_ref(xs, idx8, NUM_ROT, -1.0, "border")
    sel_fast_pallas = rotate_select(xs, idx8, NUM_ROT, -1.0, "border", "fast")
    sel_fast_xla = rotate_select_fast(xs, idx8, NUM_ROT, -1.0, "border")
    rr = jnp.asarray(rng.uniform(-np.pi / 4, np.pi / 4, 8).astype(np.float32))
    sh_tpu = shear_rotate_residual(xs, rr, 32.0, 32.0, "border")
    sh_itp = shear_rotate_residual(xs, rr, 32.0, 32.0, "border", interpret=True)
    # fused invert (rotate+roll) kernel vs its unfused composition
    from equiadapt_tpu.ops.group_action import roll_by_gather
    from equiadapt_tpu.ops.pallas.select_warp import rotate_roll_select

    y16 = jnp.asarray(
        rng.normal(size=(8, 64, 64, 16)).astype(np.float32)
    ).astype(jnp.bfloat16)
    fused = rotate_roll_select(y16, idx8, idx8, NUM_ROT, 1.0, "zeros")
    unf = rotate_select_fast(y16, idx8, NUM_ROT, 1.0, "zeros")
    unf = roll_by_gather(
        unf.reshape(8, 64, 64, 2, NUM_ROT), idx8.astype(jnp.float32)
    ).reshape(8, 64, 64, 16)
    # NCHW-spine serving entry vs the NHWC entry (same kernels/einsums)
    from equiadapt_tpu.ops.pallas.select_warp import pallas_rotate_select_nchw

    def _nchw_entry(mode):
        return jax.jit(
            lambda a, i: jnp.moveaxis(
                pallas_rotate_select_nchw(
                    jnp.moveaxis(a, -1, 1), i, NUM_ROT, -1.0, "border",
                    mode=mode,
                ),
                1, -1,
            )
        )(xs, idx8)

    sel_nchw = _nchw_entry("fast")
    sel_nchw_exact = _nchw_entry("exact")
    kernels_bitexact = (
        bool((sel_pallas == sel_blend).all())
        and bool((sel_fast_pallas == sel_fast_xla).all())
        and bool((sel_nchw == sel_fast_xla).all())
        and bool((sel_nchw_exact == sel_blend).all())
        and bool((sh_tpu == sh_itp).all())
        and bool((fused == unf).all())
    )

    # continuous (steerable) canonicalize: fast 3-shear kernel vs exact
    # dynamic-gather warp (verdict item: within ~2x of the discrete path)
    from equiadapt_tpu.images.canonicalization.continuous_group import (
        SteerableImageCanonicalization,
    )
    from equiadapt_tpu.images.networks.steerable import SteerableNetwork

    st_net = SteerableNetwork(in_channels=3, out_channels=4, kernel_size=5,
                              num_layers=1)

    def make_steer(mode, dtype):
        return SteerableImageCanonicalization(
            canonicalization_network=st_net, in_shape=(IMAGE, IMAGE, 3),
            input_crop_ratio=CROP_RATIO, resize_shape=RESIZE,
            warp_mode=mode, compute_dtype=dtype,
        )

    steer_fast = make_steer("fast", jnp.bfloat16)
    steer_exact = make_steer("exact", None)
    steer_params = jax.jit(lambda k, s: steer_exact.init(k, s, training=False))(
        jax.random.key(2), small
    )

    def steer_canon(canon):
        def step(cp, xps, slot):
            x_c, _ = canon.apply(cp, pick(xps, slot), training=False)
            return jnp.sum(x_c.astype(jnp.float32))

        return step

    # optimized orbit canonicalizer (BASELINE config 2: D8, conv energy net,
    # STL10-scale 96px) — the |G|-orbit fusion target
    from equiadapt_tpu.images import OptimizedGroupEquivariantImageCanonicalization
    from equiadapt_tpu.images.networks.conv import ConvNetwork

    opt_canon = OptimizedGroupEquivariantImageCanonicalization(
        canonicalization_network=ConvNetwork(
            in_channels=3, out_channels=32, kernel_size=3, num_layers=2,
            out_vector_size=128,
        ),
        in_shape=(96, 96, 3), num_rotations=NUM_ROT,
        group_type="roto-reflection", input_crop_ratio=0.9, resize_shape=RESIZE,
        warp_mode="fast", compute_dtype=jnp.bfloat16,
    )
    x96 = jnp.asarray(rng.normal(size=(128, 96, 96, 3)).astype(np.float32))
    opt_params = jax.jit(lambda k, s: opt_canon.init(k, s, training=False))(
        jax.random.key(3), x96[:2]
    )

    def opt_step(cp, xps, slot):
        x_c, _ = opt_canon.apply(cp, pick(xps, slot), training=False)
        return jnp.sum(x_c.astype(jnp.float32))

    # pointcloud SO(3) canonicalization (BASELINE config 4): VNSmall frame
    # estimation + rotation, ModelNet-scale point count
    from equiadapt_tpu.pointcloud.canonicalization import (
        EquivariantPointcloudCanonicalization,
    )
    from equiadapt_tpu.pointcloud.networks import VNSmall

    pc_canon = EquivariantPointcloudCanonicalization(
        canonicalization_network=VNSmall(n_knn=16, pooling="mean")
    )
    pc_canon_fast = EquivariantPointcloudCanonicalization(
        canonicalization_network=VNSmall(n_knn=16, pooling="mean",
                                         knn_mode="approx")
    )
    pc_canon_fused = EquivariantPointcloudCanonicalization(
        canonicalization_network=VNSmall(n_knn=16, pooling="mean",
                                         knn_mode="fused")
    )
    pts = jnp.asarray(rng.normal(size=(64, 1024, 3)).astype(np.float32))
    pc_params = jax.jit(lambda k, s: pc_canon.init(k, s, training=False))(
        jax.random.key(4), pts[:2]
    )

    def pc_step(cp, pps, slot):
        p_c, _ = pc_canon.apply(cp, pick(pps, slot), training=False)
        return jnp.sum(p_c)

    def pc_step_fast(cp, pps, slot):
        p_c, _ = pc_canon_fast.apply(cp, pick(pps, slot), training=False)
        return jnp.sum(p_c)

    def pc_step_fused(cp, pps, slot):
        p_c, _ = pc_canon_fused.apply(cp, pick(pps, slot), training=False)
        return jnp.sum(p_c)

    # fused pallas kNN vs the exact XLA path: index-level agreement on a
    # random cloud, checked on hardware every round (fp32-level distance
    # ties are the only admissible difference — ops/pallas/knn.py)
    from equiadapt_tpu.pointcloud.networks import knn_indices

    knn_ref = np.asarray(jax.jit(lambda p: knn_indices(p, 16, mode="exact"))(pts))
    knn_fused = np.asarray(jax.jit(lambda p: knn_indices(p, 16, mode="fused"))(pts))
    knn_mism = knn_ref != knn_fused
    knn_mismatch_count = int(knn_mism.sum())
    # bit-equality is the headline claim (both paths share the same fp32
    # elementwise distance algebra at D=3), reported as-is; separately,
    # classify any residual mismatch against f64 ground truth — only
    # fp32-ulp-level distance TIES are admissible (same k-NN set, order
    # swapped at the tie). Sampled at 1000 mismatches to bound the loop.
    knn_fused_matches = knn_mismatch_count == 0
    knn_ties_only = True
    if knn_mismatch_count:
        p64 = np.asarray(pts, np.float64)
        mism_idx = list(zip(*np.nonzero(knn_mism)))[:1000]
        for b_, n_, s_ in mism_idx:
            i1, i2 = int(knn_ref[b_, n_, s_]), int(knn_fused[b_, n_, s_])
            d1 = float(((p64[b_, n_] - p64[b_, i1]) ** 2).sum())
            d2 = float(((p64[b_, n_] - p64[b_, i2]) ** 2).sum())
            if abs(d1 - d2) > 3e-7 * max(d1, d2, 1e-30):
                knn_ties_only = False
                break

    # n-body SE(3) canonicalization (BASELINE config 3): VNDeepSets
    from equiadapt_tpu.nbody.canonicalization import EuclideanGroupNBody
    from equiadapt_tpu.nbody.vn_deepsets import VNDeepSets

    nb_canon = EuclideanGroupNBody(
        canonicalization_network=VNDeepSets(
            hidden_dim=16, num_layers=4, canon_feature="pv"
        )
    )
    nb = {
        "loc": jnp.asarray(rng.normal(size=(512, 5, 3)).astype(np.float32)),
        "vel": jnp.asarray(rng.normal(size=(512, 5, 3)).astype(np.float32)),
        "charges": jnp.asarray(
            rng.choice([-1.0, 1.0], size=(512, 5, 1)).astype(np.float32)
        ),
    }
    nb_params = jax.jit(
        lambda k, d: nb_canon.init(
            k, d["loc"][:2], loc=d["loc"][:2], vel=d["vel"][:2],
            charges=d["charges"][:2], training=False,
        )
    )(jax.random.key(5), nb)

    def nb_step(cp, d, slot):
        loc = pick(d["loc_pool"], slot)
        out_nb = nb_canon.apply(
            cp, loc, loc=loc, vel=d["vel"],
            charges=d["charges"], training=False,
        )
        (loc_c, vel_c), _info = out_nb
        return jnp.sum(loc_c) + jnp.sum(vel_c)

    # training-step canonicalize timings (forward + backward through the
    # canonicalizer): the round-2 verdict's pathological case was the
    # continuous trainer paying the 693 ms exact dynamic-gather warp every
    # step; warp_mode="fast" now trains through the custom-vjp kernel path
    def steer_train(canon):
        def loss(cp, xx):
            (x_c, info), _ = canon.apply(
                cp, xx, training=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)},
            )
            return jnp.sum(x_c.astype(jnp.float32)) + 1e-3 * jnp.sum(
                info.matrix_rep.astype(jnp.float32) ** 2
            )

        def step(cp, xps, slot):
            g = jax.grad(loss)(cp, pick(xps, slot))
            return sum(
                jnp.sum(l.astype(jnp.float32) ** 2)
                for l in jax.tree_util.tree_leaves(g)
            )

        return step

    def discrete_train(canon):
        def loss(cp, xx):
            (x_c, info), _ = canon.apply(
                cp, xx, training=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(1)},
            )
            return jnp.sum(x_c.astype(jnp.float32))

        def step(cp, xps, slot):
            g = jax.grad(loss)(cp, pick(xps, slot))
            return sum(
                jnp.sum(l.astype(jnp.float32) ** 2)
                for l in jax.tree_util.tree_leaves(g)
            )

        return step

    xp2 = pool2(x)
    pts2 = pool2(pts)
    x96_2 = pool2(x96)
    nb["loc_pool"] = pool2(nb["loc"])

    out = {"kernels_bitexact": kernels_bitexact}
    out["continuous_train_fast_ms"] = timed_ms(
        steer_train(steer_fast), steer_params, xp2
    )
    out["discrete_train_fast_ms"] = timed_ms(
        discrete_train(canon_fast), canon_params, xp2
    )
    out["pointcloud_canon_ms"] = timed_ms(pc_step, pc_params, pts2)
    out["pointcloud_canon_fast_ms"] = timed_ms(pc_step_fast, pc_params, pts2)
    out["pointcloud_canon_fused_ms"] = timed_ms(pc_step_fused, pc_params, pts2)
    out["knn_fused_matches_exact"] = knn_fused_matches
    out["knn_fused_mismatch_count"] = knn_mismatch_count
    out["knn_fused_ties_only"] = knn_ties_only
    out["nbody_canon_ms"] = timed_ms(nb_step, nb_params, nb)
    out["opt_d8_96px_ms"] = timed_ms(opt_step, opt_params, x96_2)
    out["continuous_fast_ms"] = timed_ms(steer_canon(steer_fast), steer_params, xp2)
    out["continuous_exact_ms"] = timed_ms(steer_canon(steer_exact), steer_params, xp2)
    out["tput_fast_ms"] = timed_ms(
        canon_invert(canon_fast, "fast"),
        canon_params, xp2, y.astype(jnp.bfloat16),
    )
    out["tput_exact_ms"] = timed_ms(
        canon_invert(canon_exact, "exact"), canon_params, xp2, y
    )
    # Wrapper overhead is a DIFFERENCE of ~10x-larger timings, so it is
    # measured as paired differences: alternate bare/wrapped loop-timed
    # single-rep calls and difference ADJACENT pairs — slow drift (runtime
    # state, tunnel load) cancels within a pair. The reported CI is the
    # half-spread of the per-pair differences (VERDICT round-2 item:
    # a <5% claim needs CI well under 0.3 ms to be meaningful).
    def paired_overhead(bare_fn, bare_args, wr_fn, wr_args, pairs=10):
        # Round-4 verdict: a rerun saw +-5.24 ms spread at 4 pairs under
        # host contention, making a <5% claim unreadable. Hardened: 10
        # interleaved pairs, median of the per-pair differences, CI =
        # half-spread of the middle 6 diffs (trims the 2 best/worst pairs
        # — transient tunnel/runtime spikes hit a whole pair, which the
        # pairing cancels only when the spike spans both legs).
        diffs, bares, wraps = [], [], []
        timed_ms(bare_fn, *bare_args, reps=1)  # warm both programs
        timed_ms(wr_fn, *wr_args, reps=1)
        for _ in range(pairs):
            tb = timed_ms(bare_fn, *bare_args, reps=1)
            tw = timed_ms(wr_fn, *wr_args, reps=1)
            bares.append(tb)
            wraps.append(tw)
            diffs.append(tw - tb)
        diffs_s = sorted(diffs)
        n = len(diffs_s)
        med = (
            diffs_s[n // 2]
            if n % 2
            else 0.5 * (diffs_s[n // 2 - 1] + diffs_s[n // 2])
        )
        trim = diffs_s[2:-2] if n >= 7 else diffs_s
        ci = (trim[-1] - trim[0]) / 2.0
        return min(bares), min(wraps), med, ci

    b32, w32, d32, ci32 = paired_overhead(
        bare(resnet_f32), (res_params, xp2),
        wrapped(canon_exact, resnet_f32), (canon_params, res_params, xp2),
    )
    b16, w16, d16, ci16 = paired_overhead(
        bare(resnet_bf16), (res_params_bf16, xp2),
        wrapped(canon_serving, resnet_bf16), (canon_params, res_params_bf16, xp2),
    )
    # C4 serving overhead (BASELINE config 1's group): every element is an
    # exact rot90, so the warp is ONE single-source select pass — no
    # residual two-pass. Reported alongside the C8 headline.
    net_c4 = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=4, num_layers=2, fused_pool_lift=True,
    )
    canon_c4 = GroupEquivariantImageCanonicalization(
        canonicalization_network=net_c4, in_shape=(IMAGE, IMAGE, 3),
        input_crop_ratio=1.0, resize_shape=56,
        num_rotations=4, group_type="rotation",
        warp_mode="fast", compute_dtype=jnp.bfloat16, output_dtype="compute",
    )
    canon_c4_params = jax.jit(lambda k, s: canon_c4.init(k, s, training=False))(
        jax.random.key(6), small
    )
    _, _, d16c4, ci16c4 = paired_overhead(
        bare(resnet_bf16), (res_params_bf16, xp2),
        wrapped(canon_c4, resnet_bf16), (canon_c4_params, res_params_bf16, xp2),
    )
    # bf16-INPUT serving row: a production bf16 pipeline's loader emits
    # bf16, so both legs read a bf16 batch — this removes the fp32->bf16
    # input-cast pass (154 MB read + 77 MB write at 224px/256) from the
    # wrapped leg and the fused stem-side convert from the bare leg.
    # Reported alongside (not instead of) the fp32-input headline.
    xb2 = pool2(x.astype(jnp.bfloat16), eps=1e-2)
    b16i, w16i, d16i, ci16i = paired_overhead(
        bare(resnet_bf16), (res_params_bf16, xb2),
        wrapped(canon_serving, resnet_bf16), (canon_params, res_params_bf16, xb2),
    )
    out.update({
        "bare_fp32_ms": b32, "wrapped_fp32_exact_ms": w32,
        "bare_bf16_ms": b16, "wrapped_bf16_fast_ms": w16,
        "overhead_fp32_exact_ms": d32, "overhead_fp32_exact_ci_ms": ci32,
        "overhead_bf16_fast_ms": d16, "overhead_bf16_fast_ci_ms": ci16,
        "overhead_bf16_fast_c4_ms": d16c4, "overhead_bf16_fast_c4_ci_ms": ci16c4,
        "bare_bf16_input_ms": b16i, "wrapped_bf16_input_ms": w16i,
        "overhead_bf16_input_ms": d16i, "overhead_bf16_input_ci_ms": ci16i,
    })
    out["tput_fast_img_s"] = BATCH_TPU / out["tput_fast_ms"] * 1e3
    out["tput_exact_img_s"] = BATCH_TPU / out["tput_exact_ms"] * 1e3
    out["overhead_bf16_fast_pct"] = 100.0 * d16 / b16
    out["overhead_fp32_exact_pct"] = 100.0 * d32 / b32

    # End-to-end TRAINING throughput (docs/benchmarking.md table as a
    # recorded artifact): canonicalize (C8 GCNN energy) + ResNet-50
    # forward/backward + AdamW update, one jit with donated state, batch
    # 128 @224px. Guarded by a wall-time budget: on a cold compile cache
    # the two extra fwd+bwd compiles could blow the driver's bench window;
    # the metrics appear as null then and fill in once the cache is warm.
    out["train_step_bf16_fast_ms"] = None
    out["train_step_fp32_exact_ms"] = None
    if time.perf_counter() - t_start < TRAIN_BENCH_BUDGET_S:
        import optax
        from jax import lax

        from equiadapt_tpu.pipelines import ImageClassifierPipeline

        bt = 128
        xt2 = pool2(x[:bt])
        labels = jnp.asarray(rng.integers(0, 10, size=(bt,)), dtype=jnp.int32)

        def train_ms(canon, resnet, n_loop=8, reps=2, want_flops=False):
            from equiadapt_tpu.pipelines.classification import (
                TrainState, make_train_step,
            )

            pipe = ImageClassifierPipeline(
                canonicalizer=canon, prediction_network=resnet
            )
            variables = jax.jit(pipe.init, static_argnames="training")(
                {"params": jax.random.key(7), "dropout": jax.random.key(8)},
                x[:2], training=True,
            )
            tx = optax.adamw(1e-3)
            state = TrainState(
                step=jnp.zeros((), jnp.int32),
                params=variables["params"],
                batch_stats=variables.get("batch_stats", {}),
                tx=tx, opt_state=tx.init(variables["params"]),
                apply_fn=pipe.apply,
            )
            step = make_train_step({"prior_weight": 100.0}, jit=False)
            flops = None
            if want_flops:
                # analytic matmul+conv flops by jaxpr traversal — XLA's
                # cost_analysis() returns no usable "flops" entry on this
                # backend (round-4 verdict item 4: the MFU fields shipped
                # null). Host-side trace only, no device compile.
                try:
                    from equiadapt_tpu.utils.flops import count_flops

                    flops = count_flops(
                        step, state, {"image": x[:bt], "label": labels},
                        jax.random.key(0),
                    ) or None
                except Exception as e:
                    print(f"train flop count failed: {e}", file=sys.stderr)
                    flops = None

            def run(st, xps, yy):
                def body(it, s):
                    s2, _ = step(s, {"image": pick(xps, it % 2), "label": yy},
                                 jax.random.key(0))
                    return s2

                return lax.fori_loop(0, n_loop, body, st)

            f = jax.jit(run)
            st = f(state, xt2, labels)
            float(jax.tree_util.tree_leaves(st.params)[0].sum())  # compile+sync
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                st = f(st, xt2, labels)
                float(jax.tree_util.tree_leaves(st.params)[0].sum())
                best = min(best, (time.perf_counter() - t0) / n_loop * 1e3)
            return best, flops

        out["train_step_bf16_fast_ms"], tr_flops = train_ms(
            canon_fast, resnet_bf16, want_flops=True
        )
        out["train_step_fp32_exact_ms"], _ = train_ms(canon_exact, resnet_f32)
        # MFU: XLA-counted flops per step / (step time * peak). Peak by
        # device generation; bf16 MXU numbers (fp32 paths would need the
        # fp32 peak — only the bf16-fast train/eval MFU is reported).
        out["train_flops_per_step"] = tr_flops
        out["peak_flops"] = _peak_bf16_flops()
        if tr_flops and out["train_step_bf16_fast_ms"] and out["peak_flops"]:
            out["train_mfu_pct"] = (
                100.0 * tr_flops
                / (out["train_step_bf16_fast_ms"] * 1e-3)
                / out["peak_flops"]
            )
        else:
            out["train_mfu_pct"] = None
    # eval-forward MFU from the bare ResNet-50 bf16 forward measurement;
    # analytic flop count (see utils/flops.py) sanity-anchored against the
    # published ResNet-50 number (~4.1 GFLOP/img at 224px)
    try:
        from equiadapt_tpu.utils.flops import count_flops, resnet50_eval_flops

        ev_flops = count_flops(
            lambda p, xx: resnet_bf16.apply(p, xx, training=False),
            res_params_bf16, x,
        )
        anchor = resnet50_eval_flops(BATCH_TPU, IMAGE)
        out["eval_flops_per_step"] = ev_flops
        out["eval_flops_vs_anchor"] = ev_flops / anchor
        pk = _peak_bf16_flops()
        out["eval_mfu_pct"] = (
            100.0 * ev_flops / (out["bare_bf16_ms"] * 1e-3) / pk
            if ev_flops and pk else None
        )
    except Exception as e:
        print(f"eval flop count failed: {e}", file=sys.stderr)
        out["eval_mfu_pct"] = None
    return out


def _peak_bf16_flops():
    """Peak bf16 matmul flops/s for the attached TPU generation (public
    spec sheets: v5e 197 TF, v5p 459 TF, v4 275 TF, v6e 918 TF)."""
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    table = {
        "v5 lite": 197e12, "v5e": 197e12, "v5litepod": 197e12,
        "v5p": 459e12, "v5": 459e12,
        "v4": 275e12, "v6e": 918e12, "v6 lite": 918e12,
    }
    for key, val in table.items():
        if key in kind:
            return val
    return None


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
        ch = int(np.ceil(IMAGE * CROP_RATIO))
        off = (IMAGE - ch) // 2
        xc = x[:, :, off : off + ch, off : off + ch]
        xc = F.interpolate(xc, size=(RESIZE, RESIZE), mode="bilinear",
                           align_corners=False)
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
        # best-of-reps: the baseline denominator must not absorb transient
        # host contention (observed 2-7x swings when other jobs share the
        # CPU), or vs_baseline becomes meaningless run to run
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            canonicalize_invert(x, y)
            best = min(best, time.perf_counter() - t0)
    return B / best


def _backend_watchdog(timeout_s: float = 900.0):
    """Fail fast (rather than hang forever) if the TPU runtime is
    unreachable: the axon relay occasionally dies, and a JAX client then
    blocks indefinitely inside backend init. The watchdog fires only if
    backend discovery itself never completes."""
    import os
    import threading

    done = threading.Event()

    def arm():
        if not done.wait(timeout_s):
            print(
                "bench.py: TPU backend init did not complete within "
                f"{timeout_s:.0f}s (relay down?) — aborting",
                file=sys.stderr,
                flush=True,
            )
            os._exit(42)

    threading.Thread(target=arm, daemon=True).start()

    def disarm():
        done.set()

    return disarm


def _exec_preflight(timeout_s: float = 180.0) -> None:
    """Run one tiny jit on the device under a watchdog.

    Round-5 incident: devices() enumerated and compiles returned, but the
    TPU worker was wedged and every EXECUTION blocked forever (a killed
    client left a hung device program). A bench that hangs is worse than
    one that fails — the driver window burns with no artifact. Exit 43
    with a diagnosis instead."""
    import os
    import threading

    import jax
    import jax.numpy as jnp

    done = threading.Event()

    def arm():
        if not done.wait(timeout_s):
            print(
                "bench.py: device EXECUTION did not complete within "
                f"{timeout_s:.0f}s (worker wedged? compiles fine, execs "
                "hang) — aborting",
                file=sys.stderr,
                flush=True,
            )
            os._exit(43)

    threading.Thread(target=arm, daemon=True).start()
    v = float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256))))
    done.set()
    if v != 256.0 * 256.0:
        raise RuntimeError(f"exec preflight wrong result: {v}")


def smoke() -> int:
    """Full-path hardware smoke: one real canonicalize pass per
    {family x warp_mode x kernel-path knob} on the attached backend.

    Round-4 postmortem invariant (VERDICT item 1): every kernel-path
    default flip must pass a fused full-path smoke on hardware before the
    round ends — the round-4 fault only reproduced in the fused
    energy-net+warp graph, which standalone-op tests never exercise.
    Prints one JSON line {"smoke": true, "ok": ..., "results": ...};
    exit code 0 iff every combination ran.
    """
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass

    from equiadapt_tpu.images import (
        EquivariantNetwork,
        GroupEquivariantImageCanonicalization,
        OptimizedGroupEquivariantImageCanonicalization,
    )
    from equiadapt_tpu.images.canonicalization.continuous_group import (
        SteerableImageCanonicalization,
    )
    from equiadapt_tpu.images.networks.conv import ConvNetwork
    from equiadapt_tpu.images.networks.steerable import SteerableNetwork
    from equiadapt_tpu.kernel_options import kernel_options

    B = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, IMAGE, IMAGE, 3)).astype(np.float32))
    small = x[:2]

    net = EquivariantNetwork(
        in_channels=3, out_channels=8, kernel_size=3, group_type="rotation",
        num_rotations=NUM_ROT, num_layers=2,
    )
    st_net = SteerableNetwork(in_channels=3, out_channels=4, kernel_size=5,
                              num_layers=1)

    def disc(mode):
        return GroupEquivariantImageCanonicalization(
            canonicalization_network=net, in_shape=(IMAGE, IMAGE, 3),
            input_crop_ratio=CROP_RATIO, resize_shape=RESIZE,
            num_rotations=NUM_ROT, group_type="rotation", warp_mode=mode,
            compute_dtype=jnp.bfloat16 if mode == "fast" else None,
        )

    def steer(mode):
        return SteerableImageCanonicalization(
            canonicalization_network=st_net, in_shape=(IMAGE, IMAGE, 3),
            input_crop_ratio=CROP_RATIO, resize_shape=RESIZE, warp_mode=mode,
            compute_dtype=jnp.bfloat16 if mode == "fast" else None,
        )

    opt = OptimizedGroupEquivariantImageCanonicalization(
        canonicalization_network=ConvNetwork(
            in_channels=3, out_channels=32, kernel_size=3, num_layers=2,
            out_vector_size=128,
        ),
        in_shape=(96, 96, 3), num_rotations=NUM_ROT,
        group_type="roto-reflection", input_crop_ratio=0.9,
        resize_shape=RESIZE, warp_mode="fast", compute_dtype=jnp.bfloat16,
    )
    x96 = jnp.asarray(rng.normal(size=(B, 96, 96, 3)).astype(np.float32))

    dp = jax.jit(lambda k, s: disc("exact").init(k, s, training=False))(
        jax.random.key(0), small
    )
    sp = jax.jit(lambda k, s: steer("exact").init(k, s, training=False))(
        jax.random.key(1), small
    )
    op = jax.jit(lambda k, s: opt.init(k, s, training=False))(
        jax.random.key(2), x96[:2]
    )

    combos = [
        ("discrete_fast", disc("fast"), dp, x, {}),
        ("discrete_exact", disc("exact"), dp, x, {}),
        ("discrete_fast_nchw_spine", disc("fast"), dp, x,
         {"nchw_spine": "auto"}),
        ("continuous_fast", steer("fast"), sp, x, {}),
        ("continuous_exact_pallas", steer("exact"), sp, x,
         {"exact_warp": "pallas"}),
        ("continuous_exact_taps", steer("exact"), sp, x,
         {"exact_warp": "xla", "bilinear_gather": "taps"}),
        ("continuous_exact_slab", steer("exact"), sp, x,
         {"exact_warp": "xla", "bilinear_gather": "slab"}),
        ("opt_orbit_d8", opt, op, x96, {}),
    ]
    results = {}
    ok = True
    for name, canon, params, xx, opts in combos:
        try:
            with kernel_options(**opts):
                f = jax.jit(
                    lambda p, a, c=canon: jnp.sum(
                        c.apply(p, a, training=False)[0].astype(jnp.float32)
                    )
                )
                t0 = time.perf_counter()
                v = float(f(params, xx))
                dt_compile = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(f(params, xx))
                ms = (time.perf_counter() - t0) * 1e3
            if not np.isfinite(v):
                raise ValueError(f"non-finite output sum {v}")
            results[name] = {"ok": True, "ms": round(ms, 2),
                             "compile_s": round(dt_compile, 1)}
        except Exception as e:
            ok = False
            results[name] = {"ok": False, "error": str(e).split("\n")[0][:200]}
        print(f"smoke {name}: {results[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"smoke": True, "ok": ok, "backend":
                      jax.default_backend(), "results": results}))
    return 0 if ok else 1


def _previous_bench():
    """Latest BENCH_r*.json with a parsed (rc==0) payload, for the
    regression tripwire."""
    import glob

    best = None
    for path in sorted(glob.glob("/root/repo/BENCH_r*.json")):
        try:
            with open(path) as fh:
                d = json.load(fh)
            if d.get("parsed"):
                best = (path, d["parsed"])
        except Exception:
            continue
    return best


_HIGHER_BETTER = (
    "value", "throughput_exact_mode", "opt_d8_orbit_canonicalize_img_s",
    "pointcloud_canonicalize_clouds_s",
    "pointcloud_canonicalize_clouds_s_fused_knn",
    "nbody_canonicalize_graphs_s", "train_img_s_bf16_fast",
)
_LOWER_BETTER = (
    "wrapper_overhead_pct", "wrapper_overhead_pct_c4",
    "wrapper_overhead_pct_fp32_exact", "continuous_canonicalize_fast_ms",
    "continuous_canonicalize_exact_ms", "train_step_bf16_fast_ms",
)


def _regressions(current: dict, tol: float = 0.05):
    """>tol relative drops vs the last successful BENCH artifact
    (round-4 verdict item 9: nbody drifted -9% unnoticed)."""
    prev = _previous_bench()
    if prev is None:
        return {"baseline": None, "flagged": []}
    path, ref = prev
    flagged = []
    for key in _HIGHER_BETTER + _LOWER_BETTER:
        a, b = ref.get(key), current.get(key)
        if not (
            isinstance(a, (int, float)) and isinstance(b, (int, float)) and a
        ):
            continue
        rel = (b - a) / abs(a)
        worse = rel < -tol if key in _HIGHER_BETTER else rel > tol
        if worse:
            flagged.append(
                {"metric": key, "prev": a, "now": b,
                 "change_pct": round(100.0 * rel, 1)}
            )
    return {"baseline": path.rsplit("/", 1)[-1], "flagged": flagged}


def main() -> None:
    if "--smoke" in sys.argv:
        disarm = _backend_watchdog()
        import jax

        jax.devices()
        disarm()
        _exec_preflight()
        sys.exit(smoke())
    disarm = _backend_watchdog()
    import jax

    jax.devices()  # backend init — the hang point when the relay is dead
    disarm()
    _exec_preflight()
    m = bench_jax()
    try:
        torch_ips = bench_torch_cpu()
    except Exception as e:  # torch missing or OOM: report absolute only
        print(f"torch baseline failed: {e}", file=sys.stderr)
        torch_ips = float("nan")
    jax_ips = m["tput_fast_img_s"]
    vs = jax_ips / torch_ips if torch_ips == torch_ips else None
    payload = (
            {
                "metric": "canonicalize+invert images/sec/chip @224px C8",
                "value": round(jax_ips, 2),
                "unit": "images/s",
                "vs_baseline": round(vs, 2) if vs is not None else None,
                "batch": BATCH_TPU,
                "throughput_exact_mode": round(m["tput_exact_img_s"], 2),
                "wrapper_overhead_pct": round(m["overhead_bf16_fast_pct"], 2),
                "wrapper_overhead_ms": round(m["overhead_bf16_fast_ms"], 3),
                "wrapper_overhead_ci_ms": round(
                    m["overhead_bf16_fast_ci_ms"], 3
                ),
                "wrapper_overhead_pct_c4": round(
                    100.0 * m["overhead_bf16_fast_c4_ms"] / m["bare_bf16_ms"], 2
                ),
                "wrapper_overhead_c4_ci_ms": round(
                    m["overhead_bf16_fast_c4_ci_ms"], 3
                ),
                "wrapper_overhead_pct_bf16_input": round(
                    100.0 * m["overhead_bf16_input_ms"] / m["bare_bf16_input_ms"], 2
                ),
                "wrapper_overhead_bf16_input_ci_ms": round(
                    m["overhead_bf16_input_ci_ms"], 3
                ),
                "bare_resnet50_bf16_input_ms": round(m["bare_bf16_input_ms"], 2),
                "wrapper_overhead_pct_fp32_exact": round(
                    m["overhead_fp32_exact_pct"], 2
                ),
                "wrapper_overhead_fp32_ci_ms": round(
                    m["overhead_fp32_exact_ci_ms"], 3
                ),
                "bare_resnet50_bf16_ms": round(m["bare_bf16_ms"], 2),
                "wrapped_bf16_fast_ms": round(m["wrapped_bf16_fast_ms"], 2),
                "bare_resnet50_fp32_ms": round(m["bare_fp32_ms"], 2),
                "wrapped_fp32_exact_ms": round(m["wrapped_fp32_exact_ms"], 2),
                "continuous_canonicalize_fast_ms": round(m["continuous_fast_ms"], 2),
                "continuous_train_fast_ms": round(
                    m["continuous_train_fast_ms"], 2
                ),
                "train_step_bf16_fast_ms": (
                    round(m["train_step_bf16_fast_ms"], 2)
                    if m["train_step_bf16_fast_ms"] is not None else None
                ),
                "train_img_s_bf16_fast": (
                    round(128.0 / m["train_step_bf16_fast_ms"] * 1e3, 1)
                    if m["train_step_bf16_fast_ms"] is not None else None
                ),
                "train_step_fp32_exact_ms": (
                    round(m["train_step_fp32_exact_ms"], 2)
                    if m["train_step_fp32_exact_ms"] is not None else None
                ),
                "train_mfu_pct": (
                    round(m["train_mfu_pct"], 2)
                    if m.get("train_mfu_pct") else None
                ),
                "eval_mfu_pct": (
                    round(m["eval_mfu_pct"], 2)
                    if m.get("eval_mfu_pct") else None
                ),
                "discrete_train_fast_ms": round(m["discrete_train_fast_ms"], 2),
                "continuous_canonicalize_exact_ms": round(
                    m["continuous_exact_ms"], 2
                ),
                "kernels_bitexact_on_tpu": m["kernels_bitexact"],
                "opt_d8_orbit_canonicalize_img_s": round(
                    128.0 / m["opt_d8_96px_ms"] * 1e3, 1
                ),
                "pointcloud_canonicalize_clouds_s": round(
                    64.0 / m["pointcloud_canon_ms"] * 1e3, 1
                ),
                "pointcloud_canonicalize_clouds_s_approx_knn": round(
                    64.0 / m["pointcloud_canon_fast_ms"] * 1e3, 1
                ),
                "pointcloud_canonicalize_clouds_s_fused_knn": round(
                    64.0 / m["pointcloud_canon_fused_ms"] * 1e3, 1
                ),
                "knn_fused_matches_exact": m["knn_fused_matches_exact"],
                "knn_fused_mismatch_count": m["knn_fused_mismatch_count"],
                "nbody_canonicalize_graphs_s": round(
                    512.0 / m["nbody_canon_ms"] * 1e3, 1
                ),
            }
    )
    payload["regressions"] = _regressions(payload)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
