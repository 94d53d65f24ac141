"""Pallas TPU kernel: single-pass per-sample discrete rotation select.

`rotate_discrete` (ops/warp.py) blends |G| candidates — correct and
differentiable, but it touches HBM ~2|G| times. At inference (hard one-hot,
no gradient through the selection) only ONE candidate per sample is needed:
this kernel reads each image once and writes its selected rotation once.

The per-sample element index arrives as a *scalar-prefetch* argument, so it
can steer the input BlockSpec: for C8, odd elements read their block from a
pre-warped +45-degree copy (R(45 + 90k) = rot90^k . R(45)), even elements
from the original — the index_map picks the source plane before the kernel
body runs. The in-kernel rot90 uses the same exchange-matrix MXU reversals
as the orbit kernel (Mosaic has no `rev`).

Traffic: one read + one write of the batch (plus one static-tap 45-degree
warp for C8), versus ~2|G| passes for the blend. Exact same numerics as
`rotate_discrete` with a hard one-hot (tests assert bit-equality in
interpret mode; the TPU check script asserts it on hardware).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

__all__ = [
    "pallas_rotate_select",
    "pallas_rotate_select_nchw",
    "rotate_select",
    "rotate_select_nchw",
]


def _rot90_strategy() -> str:
    """Kernel rot90 lowering strategy, from EQUIADAPT_ROT90_STRATEGY.

    "mixed" (default since round 4): for bf16 payloads, keep operands
    bf16 — single-MXU-pass exchange matmuls for k=2 and an explicit
    in-VMEM transpose feeding a bf16 matmul for k=1/3. Bit-identical
    output (every product is 1 * value; asserted against the fp32 path on
    hardware, round-4 measurement: ~6% faster on the C8 steered select).
    "fp32": exchange-matrix reversals on fp32 operands — the round-2
    proven fallback (fp32 payloads always take this path).

    Read OUTSIDE the jitted kernels and threaded as a static argument, so
    flipping the option cannot hit a stale jit cache.
    """
    from equiadapt_tpu.kernel_options import current_kernel_options

    return current_kernel_options().rot90_strategy


def _emit_rot90(plane, k, out_store, H: int, W: int, dt, strategy: str = "fp32"):
    """Write rot90^k(plane) through `out_store` (a (H, W)-shaped ref setter).

    Mosaic has no `rev` and its matmuls need 32-bit accumulators (transposed
    bf16 operands are rejected outright), so the rot90 runs in fp32 in-VMEM
    via exchange-matrix MXU reversals: bf16 values are held exactly in fp32
    and the exchange matrix has a single 1 per row/col, so every step — and
    the cast back — is lossless. strategy="mixed" (see `_rot90_strategy`)
    keeps bf16 payloads in bf16: the reversal matmuls run in one MXU pass
    instead of the fp32 multi-pass mode, and the k=1/3 transposes happen as
    explicit relayout ops instead of transposed fp32 operands.
    """
    from jax.experimental import pallas as pl

    use_bf16 = strategy == "mixed" and dt == jnp.bfloat16
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    img = plane.astype(cdt)  # (H, W)
    rows = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
    ex = (rows + cols == H - 1).astype(cdt)
    # Precision by payload dtype: bf16-valued data survives single-pass
    # bf16 MXU exactly (operand truncation is the identity on bf16 values,
    # and each output is a single product), so DEFAULT is both exact and
    # ~6x faster than the multi-pass fp32 mode; true fp32 payloads need
    # HIGHEST to keep the copy bit-exact.
    prec = (
        jax.lax.Precision.DEFAULT
        if dt == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def rl(y):
        return jax.lax.dot_general(
            y, ex, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def rs(y):
        return jax.lax.dot_general(
            ex, y, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    def t(y):
        # "mixed": explicit relayout transpose (bf16 operands stay bf16 —
        # only matmuls with *transposed operands* were rejected by Mosaic);
        # "fp32": the transpose stays fused into the fp32 dot operand.
        return y.T

    @pl.when(k == 0)
    def _():
        out_store(img.astype(dt))

    @pl.when(k == 1)
    def _():
        out_store(rs(t(img)).astype(dt))

    @pl.when(k == 2)
    def _():
        out_store(rs(rl(img)).astype(dt))

    @pl.when(k == 3)
    def _():
        out_store(rl(t(img)).astype(dt))


@functools.partial(jax.jit, static_argnames=("interpret", "strategy"))
def _pallas_select(
    sources: Array, src_idx: Array, k_idx: Array, interpret: bool = False,
    strategy: str = "fp32",
) -> Array:
    """sources: (S, B, C, H, W); per sample pick plane (src_idx[b], b, c) and
    rot90 it by k_idx[b]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S, B, C, H, W = sources.shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # src_idx, k_idx
        grid=(B, C),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 1, H, W),
                lambda b, c, src_ref, k_ref: (src_ref[b], b, c, 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, H, W), lambda b, c, src_ref, k_ref: (b, c, 0, 0)),
    )

    def kernel(src_ref, k_ref, in_ref, out_ref):
        b = pl.program_id(0)

        def store(v):
            out_ref[0, 0] = v

        _emit_rot90(in_ref[0, 0, 0], k_ref[b] % 4, store, H, W, in_ref.dtype,
                    strategy)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), sources.dtype),
        interpret=interpret,
    )(src_idx.astype(jnp.int32), k_idx.astype(jnp.int32), sources)


@functools.lru_cache(maxsize=None)
def _c_n_decomposition(n: int, sign: float):
    """Residual/quarter-turn decomposition of the C_n select angles.

    rotate(x, sign * theta_g) == rot90^{k_of[g]}(rotate(x, residues[src_of[g]]))
    on square images, with residues in [0, 90) (residues[0] == 0, the
    identity source). Number of distinct residues decides how many warped
    source copies the steered kernels need: 2 for C8, 3 for C6/C12, 4 for
    C16; odd orders degenerate towards n/2 sources and fall back to blends.
    """
    residues = [0.0]
    src_of, k_of = [], []
    for g in range(n):
        ang = (sign * (360.0 * g / n)) % 360.0
        r = round(ang % 90.0, 6)
        k = int(round((ang - r) / 90.0)) % 4
        if r != 0.0 and r not in residues:
            residues.append(r)
        src_of.append(0 if r == 0.0 else residues.index(r))
        k_of.append(k)
    return tuple(residues), tuple(src_of), tuple(k_of)


def _pallas_select2(
    xn: Array, yn: Array, src_idx: Array, k_idx: Array, interpret: bool = False
) -> Array:
    """Two-source select (see `_pallas_selectn`)."""
    return _pallas_selectn((xn, yn), src_idx, k_idx, interpret=interpret)


def _latest_used_blocks(src_idx: Array, num_sources: int) -> list:
    """Per-source "latest used sample" index arrays for DMA-skip steering.

    blk_s[b] = max{b' <= b : src_idx[b'] == s} (0 if none yet). Feeding
    this to a source's BlockSpec index_map makes every grid step where the
    source is NOT selected revisit the block it last DMA'd — and Pallas
    skips the DMA when consecutive steps map to the same block index — so
    each sample reads exactly ONE source plane instead of all S. The only
    residual traffic is one never-consumed block refetch per used->unused
    transition in the sample sequence (bounded by B/2 planes, measured
    negligible vs the S-1 full-batch reads it removes).
    """
    b_iota = jnp.arange(src_idx.shape[0], dtype=jnp.int32)
    out = []
    for s in range(num_sources):
        seq = jnp.where(src_idx == s, b_iota, jnp.int32(-1))
        blk = jax.lax.associative_scan(jnp.maximum, seq)
        out.append(jnp.maximum(blk, 0).astype(jnp.int32))
    return out


def _pair_batch() -> int:
    """Samples per select-kernel grid step, from EQUIADAPT_SELECT_PAIR.

    Default 2 (round-4 measurement: pairing halves the grid-step count and
    its fixed DMA-issue cost, ~-0.1 ms on the C8/224px/256 chain; a mixed-
    source pair fetches both sources for both samples, but the extra
    traffic is cheaper than the saved issue overhead). Set to 1 to restore
    per-sample steering. Read OUTSIDE jit and passed statically.
    """
    from equiadapt_tpu.kernel_options import current_kernel_options

    return max(1, current_kernel_options().select_pair)


@functools.partial(jax.jit, static_argnames=("interpret", "strategy", "bt"))
def _pallas_selectn(
    sources, src_idx: Array, k_idx: Array, interpret: bool = False,
    strategy: str = "fp32", bt: int = 1,
) -> Array:
    """Multi-source select: per sample pick plane (b, c) from
    `sources[src_idx[b]]` (each (B, C, H, W)) and rot90 it by k_idx[b].

    Unlike `_pallas_select`, the sources stay separate arrays — no stacked
    copy is materialized (jnp.stack costs extra HBM round trips of the
    batch at the XLA level, which dominated the kernel's own traffic). All
    S planes are DMA'd per grid step (S-fold read amplification — callers
    cap S at ~4, past which the XLA blend path wins); the select happens
    in VMEM.

    bt > 1 processes bt samples per grid step (round-4): fewer grid steps
    amortize the per-step DMA issue cost; a group whose samples pick
    different sources fetches each used source's whole (bt, bc, H, W)
    block, trading some read amplification for issue overhead (measured
    net win at bt=2, C8/224px). Selected values are bit-identical for any
    bt — the per-sample select/rot90 algebra is unchanged.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sources = tuple(sources)
    B, C, H, W = sources[0].shape
    if bt > 1 and B % bt != 0:
        bt = 1
    # Block sizing: a few channel planes per grid step. Whole-image blocks
    # at wide fibers (C=16 regular reps) push ~10 MB of block buffers into
    # VMEM, defeating double-buffering and serializing the DMAs (measured
    # ~31 us/sample at C=16); per-plane blocks pay DMA-issue latency on
    # B*C tiny steps instead. 2-4 planes per step keeps both in check.
    bc = 1
    for cand in (4, 3, 2, 1):  # 3 covers RGB canonicalize warps
        if C % cand == 0:
            bc = cand
            break
    src_idx = src_idx.astype(jnp.int32)
    if bt > 1:
        return _pallas_selectn_grouped(
            sources, src_idx, k_idx.astype(jnp.int32), bc, bt,
            interpret=interpret, strategy=strategy,
        )
    # Latest-used-block steering (round 4): each source's index_map pins
    # unselected grid steps to the block it last fetched, so Pallas's
    # same-block revisit rule skips the DMA — per sample only the SELECTED
    # source plane moves (1 read + 1 write of the batch, the 2-trip floor),
    # instead of the S-fold read amplification of round 3.
    blks = _latest_used_blocks(src_idx, len(sources))

    def _spec(s):
        def imap(b, c, src_ref, k_ref, *blk_refs):
            used = src_ref[b] == s
            return (
                jnp.where(used, b, blk_refs[s][b]),
                jnp.where(used, c, 0),
                0,
                0,
            )

        return pl.BlockSpec((1, bc, H, W), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + len(sources),  # src_idx, k_idx, blk_s...
        grid=(B, C // bc),
        in_specs=[_spec(s) for s in range(len(sources))],
        out_specs=pl.BlockSpec(
            (1, bc, H, W), lambda b, c, *_: (b, c, 0, 0)
        ),
    )

    def kernel(src_ref, k_ref, *refs):
        src_refs, out_ref = refs[len(sources) : -1], refs[-1]
        b = pl.program_id(0)
        k = k_ref[b] % 4
        for c in range(bc):
            plane = src_refs[0][0, c]
            for s in range(1, len(src_refs)):
                plane = jnp.where(src_ref[b] == s, src_refs[s][0, c], plane)

            def store(v, c=c):
                out_ref[0, c] = v

            _emit_rot90(plane, k, store, H, W, sources[0].dtype, strategy)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), sources[0].dtype),
        interpret=interpret,
    )(src_idx, k_idx.astype(jnp.int32), *blks, *sources)


def _pallas_selectn_grouped(
    sources, src_idx: Array, k_idx: Array, bc: int, bt: int,
    interpret: bool = False, strategy: str = "fp32",
) -> Array:
    """bt-samples-per-step variant of `_pallas_selectn` (see its docstring).

    Steering is per GROUP: a source is DMA'd for a group when any of its
    bt samples selects it; unselected groups revisit the source's last
    used group block (the same-block rule skips the DMA)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sources = tuple(sources)
    B, C, H, W = sources[0].shape
    grp_src = src_idx.reshape(-1, bt)
    piota = jnp.arange(grp_src.shape[0], dtype=jnp.int32)
    grp_any, blks = [], []
    for s in range(len(sources)):
        used = (grp_src == s).any(axis=1)
        grp_any.append(used.astype(jnp.int32))
        seq = jnp.where(used, piota, jnp.int32(-1))
        blk = jax.lax.associative_scan(jnp.maximum, seq)
        blks.append(jnp.maximum(blk, 0).astype(jnp.int32))

    S = len(sources)

    def _spec(s):
        def imap(p, c, src_ref, k_ref, *scal):
            any_s, blk_s = scal[s], scal[S + s]
            used = any_s[p] == 1
            return (jnp.where(used, p, blk_s[p]), jnp.where(used, c, 0), 0, 0)

        return pl.BlockSpec((bt, bc, H, W), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + 2 * S,  # src, k, any_s..., blk_s...
        grid=(B // bt, C // bc),
        in_specs=[_spec(s) for s in range(S)],
        out_specs=pl.BlockSpec((bt, bc, H, W), lambda p, c, *_: (p, c, 0, 0)),
    )

    def kernel(src_ref, k_ref, *refs):
        src_refs, out_ref = refs[2 * S : -1], refs[-1]
        p = pl.program_id(0)
        for i in range(bt):
            b = p * bt + i
            k = k_ref[b] % 4
            for c in range(bc):
                plane = src_refs[0][i, c]
                for s in range(1, S):
                    plane = jnp.where(src_ref[b] == s, src_refs[s][i, c], plane)

                def store(v, i=i, c=c):
                    out_ref[i, c] = v

                _emit_rot90(plane, k, store, H, W, sources[0].dtype, strategy)

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), sources[0].dtype),
        interpret=interpret,
    )(src_idx, k_idx, *grp_any, *blks, *sources)


def _emit_rot90_interleaved(
    Z, k, c_ch: int, out_store, H: int, WC: int, dt, strategy: str = "mixed"
):
    """Write rot90^k of a channel-interleaved row plane through `out_store`.

    Z is an (H, W*C) VMEM view of one NHWC sample (C channels interleaved
    along the minor axis); `out_store` receives the rotated plane in the
    SAME interleaved layout. This keeps the whole canonicalize fast path in
    the network-native NHWC layout: no transpose copies feed the kernel
    and none follow it (the prediction stem reads the output bytes as
    (H, W, C) directly).

    Algebra (all matmuls; Mosaic has no `rev`):
    * k=0: copy.
    * k=2: EX_H @ Z @ PX, with PX the (WC, WC) block anti-diagonal
      permutation that reverses W while fixing the channel within each
      W-block — one reversal matmul per side, same MXU work as the NCHW
      kernel's per-plane reversals (work scales with the bytes moved).
    * k=1/3: per channel c, de-interleave Y_c = Z @ S_c ((WC, W)
      selection), rot90 Y_c exactly as `_emit_rot90`, re-interleave by
      accumulating out += rot(Y_c) @ S_c^T. ~3x the MXU flops of the NCHW
      kernel at C=3 — still far below the DMA time it saves by never
      materializing an NCHW transpose of the batch in HBM.

    Every matmul has exactly one nonzero per output element, so bf16
    payloads are exact under single-pass DEFAULT precision ("mixed"
    strategy); fp32 payloads use HIGHEST like `_emit_rot90`.
    """
    from jax.experimental import pallas as pl

    assert WC % c_ch == 0
    W = WC // c_ch
    use_bf16 = strategy == "mixed" and dt == jnp.bfloat16
    cdt = jnp.bfloat16 if use_bf16 else jnp.float32
    img = Z.astype(cdt)
    prec = (
        jax.lax.Precision.DEFAULT
        if dt == jnp.bfloat16
        else jax.lax.Precision.HIGHEST
    )

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )

    rows_h = jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
    cols_h = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
    ex_h = (rows_h + cols_h == H - 1).astype(cdt)

    @pl.when(k == 0)
    def _():
        out_store(img.astype(dt))

    @pl.when(k == 2)
    def _():
        r = jax.lax.broadcasted_iota(jnp.int32, (WC, WC), 0)
        q = jax.lax.broadcasted_iota(jnp.int32, (WC, WC), 1)
        px = ((r % c_ch == q % c_ch) & (r // c_ch + q // c_ch == W - 1)).astype(cdt)
        out_store(dot(dot(ex_h, img), px).astype(dt))

    if c_ch == 1:
        # plain (H, W) plane: reuse the exchange/transpose forms directly
        @pl.when(k == 1)
        def _():
            out_store(dot(ex_h, img.T).astype(dt))

        @pl.when(k == 3)
        def _():
            out_store(dot(img.T, ex_h).astype(dt))

        return

    # Odd quarter turns: O = sum_c A_c @ Z^T @ B_c with STATIC permutation
    # factors (A_c row-selects the c-subgrid of the transposed plane, B_c
    # re-interleaves the columns) — one shared whole-matrix transpose plus
    # 2 permutation matmuls per channel. The channel sum is irreducible:
    # a quarter turn of an interleaved plane couples the channel slot of
    # the minor index into the major row selection, which no single
    # (row-perm, col-perm) pair can express.
    ri = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 0)  # i (rows)
    mi = jax.lax.broadcasted_iota(jnp.int32, (H, WC), 1)  # m (cols)
    T = img.T  # (WC, H) — explicit relayout; bf16 transposes lower fine

    def odd(k_val):
        acc = None
        for c in range(c_ch):
            if k_val == 1:
                # O[i, j*C+c] = Z[j, (W-1-i)*C+c] = T[(W-1-i)*C+c, j]
                a_c = ((mi % c_ch == c) & (mi // c_ch + ri == W - 1)).astype(cdt)
                b_c = ((mi % c_ch == c) & (mi // c_ch == ri)).astype(cdt)
            else:
                # O[i, j*C+c] = Z[W-1-j, i*C+c] = T[i*C+c, W-1-j]
                a_c = ((mi % c_ch == c) & (mi // c_ch == ri)).astype(cdt)
                b_c = ((mi % c_ch == c) & (mi // c_ch + ri == W - 1)).astype(cdt)
            term = dot(dot(a_c, T).astype(cdt), b_c)
            acc = term if acc is None else acc + term
        return acc.astype(dt)

    @pl.when(k == 1)
    def _():
        out_store(odd(1))

    @pl.when(k == 3)
    def _():
        out_store(odd(3))


@functools.partial(jax.jit, static_argnames=("c_ch", "interpret", "strategy"))
def _pallas_selectn_ilv(
    sources, src_idx: Array, k_idx: Array, c_ch: int, interpret: bool = False,
    strategy: str = "mixed",
) -> Array:
    """Steered multi-source select on channel-interleaved NHWC row planes.

    sources: tuple of (B, H, W*C) views of NHWC tensors (reshape is free —
    same bytes). Per sample b: pick sources[src_idx[b]][b], rot90 it by
    k_idx[b] in the interleaved layout (`_emit_rot90_interleaved`), write
    (B, H, W*C). Latest-used-block steering skips the DMA of unselected
    sources (see `_pallas_selectn`), so traffic is one read + one write of
    the batch regardless of how many residual sources exist.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sources = tuple(sources)
    B, H, WC = sources[0].shape
    src_idx = src_idx.astype(jnp.int32)
    blks = _latest_used_blocks(src_idx, len(sources))

    def _spec(s):
        def imap(b, src_ref, k_ref, *blk_refs):
            used = src_ref[b] == s
            return (jnp.where(used, b, blk_refs[s][b]), 0, 0)

        return pl.BlockSpec((1, H, WC), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2 + len(sources),
        grid=(B,),
        in_specs=[_spec(s) for s in range(len(sources))],
        out_specs=pl.BlockSpec((1, H, WC), lambda b, *_: (b, 0, 0)),
    )

    def kernel(src_ref, k_ref, *refs):
        src_refs, out_ref = refs[len(sources) : -1], refs[-1]
        b = pl.program_id(0)
        plane = src_refs[0][0]
        for s in range(1, len(src_refs)):
            plane = jnp.where(src_ref[b] == s, src_refs[s][0], plane)

        def store(v):
            out_ref[0] = v

        _emit_rot90_interleaved(
            plane, k_ref[b] % 4, c_ch, store, H, WC, sources[0].dtype, strategy
        )

    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, WC), sources[0].dtype),
        interpret=interpret,
    )(src_idx, k_idx.astype(jnp.int32), *blks, *sources)


def pallas_rotate_select_nhwc(
    x: Array,
    idx: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "border",
    interpret: bool = False,
    mode: str = "fast",
) -> Array:
    """Single-pass select natively in NHWC: no transpose on either side.

    The NCHW kernels are bracketed by full-batch transposes whose HBM
    copies dominate the select itself at C=3 (round-3 attribution table,
    docs/benchmarking.md). Here the sources stay NHWC — each (B, H, W, C)
    tensor is viewed as (B, H, W*C) rows (free reshape) and the rot90 runs
    in the channel-interleaved layout inside the kernel — and the output
    bytes are already the (B, H, W, C) the prediction stem wants. Selected
    values are bit-identical to `rotate_select(...)` (same residual-source
    warps, exchange-matrix reversal algebra; asserted in tests and on
    hardware by bench.py).
    """
    from equiadapt_tpu.ops.warp import _static_rotate, rotate_twopass

    B, H, W, C = x.shape
    assert H == W, "select kernel needs square images"
    residues, src_of, k_of = _c_n_decomposition(
        num_rotations, 1.0 if sign > 0 else -1.0
    )
    assert len(residues) <= 4, (num_rotations, residues)
    idx = jnp.mod(idx.astype(jnp.int32), num_rotations)
    src_idx = jnp.asarray(src_of, jnp.int32)[idx]
    k_idx = jnp.asarray(k_of, jnp.int32)[idx]
    residual = rotate_twopass if mode == "fast" else _static_rotate
    # the exact 4-tap warp accumulates in fp32; cast back to the payload
    # dtype BEFORE the kernel so the selected values match the blend path
    # bit-for-bit (the blend also rounds once, after its hard one-hot)
    sources = [x] + [
        residual(x, r, padding_mode).astype(x.dtype) for r in residues[1:]
    ]
    if len(sources) == 1:
        sources = sources * 2  # degenerate second source keeps one kernel
    flat = tuple(s.reshape(B, H, W * C) for s in sources)
    out = _pallas_selectn_ilv(
        flat, src_idx, k_idx, C, interpret=interpret, strategy=_rot90_strategy()
    )
    return out.reshape(B, H, W, C)


def _pallas_select2_rolled(
    xn: Array,
    yn: Array,
    src_idx: Array,
    k_idx: Array,
    shift: Array,
    num_group: int,
    num_rotations: int,
    refl: Optional[Array] = None,
    interpret: bool = False,
) -> Array:
    """Two-source rolled select (see `_pallas_selectn_rolled`)."""
    return _pallas_selectn_rolled(
        (xn, yn), src_idx, k_idx, shift, num_group, num_rotations,
        refl=refl, interpret=interpret,
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_group", "num_rotations", "interpret", "strategy"),
)
def _pallas_selectn_rolled(
    sources,
    src_idx: Array,
    k_idx: Array,
    shift: Array,
    num_group: int,
    num_rotations: int,
    refl: Optional[Array] = None,
    interpret: bool = False,
    strategy: str = "fp32",
) -> Array:
    """`_pallas_select2` with the regular-rep fiber roll fused in.

    The invert engine's channel roll (roll_by_gather: output fiber g reads
    input fiber (g - shift[b]) mod n; reflection fibers roll the opposite
    way for D_n) is a per-sample channel permutation, and it commutes with
    the spatial transform — so it costs nothing here: each output plane
    simply DMAs its rolled source plane via the scalar-steered input
    index_map. Replaces a separate one-hot-matmul roll pass over the full
    feature map (~2 HBM round trips + MXU work at C=16/224px).

    For D_n (`num_group == 2 * num_rotations`) pass `refl` (B,) hard 0/1:
    the per-sample hflip after the rot90 happens in-VMEM as one extra
    exchange-matrix lane reversal.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sources = tuple(sources)
    B, C, H, W = sources[0].shape
    if H != W:
        raise ValueError(
            f"_pallas_selectn_rolled needs square images (rot90 branches "
            f"transpose through permutation matmuls); got H={H}, W={W}"
        )
    G = num_group
    n = num_rotations
    assert C % G == 0, (C, G)
    assert G in (n, 2 * n), (G, n)
    with_refl = refl is not None
    nps = 4 if with_refl else 3

    def _src_p(p, s):
        if G == n:
            return jnp.mod(p - s, n)
        # D_n: rotation fibers [0, n) roll +s, reflection fibers [n, 2n)
        # roll -s (reference images/utils.py:68-77 semantics, corrected
        # blend convention per DEVIATIONS.md)
        return jnp.where(
            p < n, jnp.mod(p - s, n), n + jnp.mod(p - n + s, n)
        )

    src_idx = src_idx.astype(jnp.int32)
    # latest-used-block steering: see `_pallas_selectn` — unselected
    # sources revisit their last-fetched block, so Pallas skips their DMA
    blks = _latest_used_blocks(src_idx, len(sources))

    def _src_spec(si):
        def imap(b, c, *scalars):
            sel_, sh_ = scalars[0], scalars[2]
            blk_ = scalars[nps + si]
            used = sel_[b] == si
            rolled_c = (c // G) * G + _src_p(c % G, sh_[b])
            return (
                jnp.where(used, b, blk_[b]),
                jnp.where(used, rolled_c, 0),
                0,
                0,
            )

        return pl.BlockSpec((1, 1, H, W), imap)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=nps + len(sources),  # src,k,shift[,refl],blk_s...
        grid=(B, C),
        in_specs=[_src_spec(si) for si in range(len(sources))],
        out_specs=pl.BlockSpec(
            (1, 1, H, W), lambda b, c, *scalars: (b, c, 0, 0)
        ),
    )

    def kernel(src_ref, k_ref, sh_ref, *rest):
        # rest = ([refl_ref,] blk_0..blk_{S-1}, tensor_0..tensor_{S-1}, out)
        refl_ref = rest[0] if with_refl else None
        rest_t = rest[(1 if with_refl else 0) + len(sources) :]
        src_refs, out_ref = rest_t[:-1], rest_t[-1]
        b = pl.program_id(0)
        plane = src_refs[0][0, 0]
        for si in range(1, len(src_refs)):
            plane = jnp.where(src_ref[b] == si, src_refs[si][0, 0], plane)

        if with_refl:
            rows = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
            cols = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
            exw = (rows + cols == W - 1).astype(jnp.float32)
            do_flip = refl_ref[b] == 1

            def store(v):
                v32 = v.astype(jnp.float32)
                flipped = jax.lax.dot_general(
                    v32, exw, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=(
                        jax.lax.Precision.DEFAULT
                        if v.dtype == jnp.bfloat16
                        else jax.lax.Precision.HIGHEST
                    ),
                )
                out_ref[0, 0] = jnp.where(do_flip, flipped, v32).astype(v.dtype)
        else:

            def store(v):
                out_ref[0, 0] = v

        _emit_rot90(plane, k_ref[b] % 4, store, H, W, sources[0].dtype,
                    strategy)

    scalars = [
        src_idx,
        k_idx.astype(jnp.int32),
        shift.astype(jnp.int32),
    ]
    if with_refl:
        scalars.append(refl.astype(jnp.int32))
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, C, H, W), sources[0].dtype),
        interpret=interpret,
    )(*scalars, *blks, *sources)


def rotate_roll_select(
    x: Array,
    idx: Array,
    shift: Array,
    num_rotations: int,
    sign: float = 1.0,
    padding_mode: str = "zeros",
    refl: Optional[Array] = None,
    interpret: bool = False,
    mode: str = "fast",
) -> Array:
    """Fused single-pass invert: spatial rotate-select (+ optional hard
    per-sample hflip for D_n) + regular-rep fiber roll in one pallas pass.
    Bit-identical to `rotate_select(..., mode=mode)` (+ hflip blend) then
    `roll_by_gather` (pure permutations compose exactly; asserted in tests
    and on hardware by bench.py). Square images, hard selection.

    mode="fast" builds the odd-residue sources with the two-pass MXU warp;
    mode="exact" with the static-tap 4-tap warp (torch-parity numerics,
    reference images/utils.py:32-94) — the kernel itself is identical, so
    exact mode inherits the single-pass traffic profile (round-4 verdict
    item: exact eval invert used to fall back to the 2|G|-trip blend plus
    a separate fiber-roll einsum pass).

    With `refl` given, the channel layout is the D_n regular rep
    (C = fields * 2 * num_rotations): rotation fibers roll +shift,
    reflection fibers -shift, and reflected samples get an in-VMEM hflip.
    """
    from equiadapt_tpu.ops.warp import _static_rotate, rotate_twopass_nchw

    B, H, W, C = x.shape
    residues, src_of, k_of = _c_n_decomposition(
        num_rotations, 1.0 if sign > 0 else -1.0
    )
    assert H == W and len(residues) <= 4, (num_rotations, residues)
    idx = jnp.mod(idx.astype(jnp.int32), num_rotations)
    src_idx = jnp.asarray(src_of, jnp.int32)[idx]
    k_idx = jnp.asarray(k_of, jnp.int32)[idx]
    if mode == "fast":
        residual_sources = [
            rotate_twopass_nchw(x, r, padding_mode) for r in residues[1:]
        ]
    else:
        residual_sources = [
            jnp.moveaxis(_static_rotate(x, r, padding_mode), -1, 1)
            for r in residues[1:]
        ]
    sources = [jnp.moveaxis(x, -1, 1)] + residual_sources
    if len(sources) == 1:
        sources = sources * 2  # degenerate second source keeps one kernel
    num_group = num_rotations if refl is None else 2 * num_rotations
    out = _pallas_selectn_rolled(
        tuple(sources), src_idx, k_idx, shift, num_group, num_rotations,
        refl=refl, interpret=interpret, strategy=_rot90_strategy(),
    )
    return jnp.moveaxis(out, 1, -1)


def pallas_rotate_select_nchw(
    xn: Array,
    idx: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "border",
    interpret: bool = False,
    mode: str = "fast",
) -> Array:
    """Select on an already-NCHW batch, emitting NCHW.

    The NCHW-spine serving path (discrete_group.py) casts+transposes the
    input once and keeps every warp consumer on that tensor; this entry
    skips `pallas_rotate_select`'s moveaxis brackets on both sides. The
    selected planes are bit-identical to the NHWC entry for both modes
    (same residual einsum contraction / static taps, same kernel).
    """
    from equiadapt_tpu.ops.warp import (
        _static_rotate_from_nchw,
        rotate_twopass_from_nchw,
    )

    B, C, H, W = xn.shape
    assert H == W, "select kernel needs square images"
    residues, src_of, k_of = _c_n_decomposition(
        num_rotations, 1.0 if sign > 0 else -1.0
    )
    assert len(residues) <= 4, (num_rotations, residues)
    idx = jnp.mod(idx.astype(jnp.int32), num_rotations)
    src_idx = jnp.asarray(src_of, jnp.int32)[idx]
    k_idx = jnp.asarray(k_of, jnp.int32)[idx]
    if len(residues) == 1:
        return _pallas_select(
            xn[None], src_idx, k_idx, interpret=interpret,
            strategy=_rot90_strategy(),
        )
    residual = (
        rotate_twopass_from_nchw if mode == "fast" else _static_rotate_from_nchw
    )
    sources = [xn] + [residual(xn, r, padding_mode) for r in residues[1:]]
    return _pallas_selectn(
        tuple(sources), src_idx, k_idx, interpret=interpret,
        strategy=_rot90_strategy(), bt=_pair_batch(),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def rotate_select_nchw(
    x: Array,
    idx: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "border",
    mode: str = "fast",
    interpret: bool = False,
) -> Array:
    """`pallas_rotate_select_nchw` with the same custom VJP contract as
    `rotate_select`: linear in x (backward = linear transpose of the
    matching NHWC formulation bracketed by moveaxis — grad-through-eval
    is rare, so the backward does not need the NCHW fast path), no
    gradient to `idx`. Keeps eval-mode canonicalize differentiable in x
    on the NCHW spine."""
    return pallas_rotate_select_nchw(
        x, idx, num_rotations, sign, padding_mode, interpret=interpret, mode=mode
    )


def _rsn_fwd(x, idx, num_rotations, sign, padding_mode, mode, interpret):
    out = rotate_select_nchw(
        x, idx, num_rotations, sign, padding_mode, mode, interpret
    )
    token = jnp.zeros((0,) + x.shape, x.dtype)
    return out, (idx, token)


def _rsn_bwd(num_rotations, sign, padding_mode, mode, interpret, res, g):
    idx, token = res
    from equiadapt_tpu.ops.warp import rotate_select_fast

    def f(xx):
        nhwc = jnp.moveaxis(xx, 1, -1)
        out = rotate_select_fast(nhwc, idx, num_rotations, sign, padding_mode)
        return jnp.moveaxis(out, -1, 1)

    spec = jax.ShapeDtypeStruct(token.shape[1:], token.dtype)
    (dx,) = jax.linear_transpose(f, spec)(g)
    d_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dx, d_idx


rotate_select_nchw.defvjp(_rsn_fwd, _rsn_bwd)


def pallas_rotate_select(
    x: Array,
    idx: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "border",
    interpret: bool = False,
    mode: str = "exact",
) -> Array:
    """Single-pass select: out[b] = rotate(x[b], sign * theta_{idx[b]}).

    Supports any C_n whose residual decomposition needs at most 4 source
    planes (1/2/3/4/6/8/12/16, ...) on square NHWC images. Matches
    `rotate_discrete` with the hard one-hot of `idx` exactly: mode="exact"
    builds the C8 45-degree source plane with the static-tap warp (torch
    parity), mode="fast" with the two-pass MXU warp (`rotate_twopass`) —
    bit-identical to `rotate_select_fast` but ~2x less HBM traffic (the
    steered BlockSpec reads ONE candidate plane per sample instead of
    blending all of them; see docs/benchmarking.md round-2 notes).
    """
    from equiadapt_tpu.ops.warp import _static_rotate

    B, H, W, C = x.shape
    assert H == W, "select kernel needs square images"
    residues, src_of, k_of = _c_n_decomposition(
        num_rotations, 1.0 if sign > 0 else -1.0
    )
    assert len(residues) <= 4, (num_rotations, residues)

    idx = jnp.mod(idx.astype(jnp.int32), num_rotations)
    src_idx = jnp.asarray(src_of, jnp.int32)[idx]
    k_idx = jnp.asarray(k_of, jnp.int32)[idx]
    if len(residues) > 1:
        if mode == "fast":
            # multi-source kernel: each warped residual plane comes straight
            # out of the second twopass GEMM in NCHW; no stacked copy
            from equiadapt_tpu.ops.warp import rotate_twopass_nchw

            sources = [jnp.moveaxis(x, -1, 1)] + [
                rotate_twopass_nchw(x, r, padding_mode) for r in residues[1:]
            ]
            out = _pallas_selectn(
                tuple(sources), src_idx, k_idx, interpret=interpret,
                strategy=_rot90_strategy(), bt=_pair_batch(),
            )
            return jnp.moveaxis(out, 1, -1)
        # exact mode: static-tap warped residual sources through the same
        # multi-input kernel (no stacked copy — the jnp.stack of round 2
        # cost an extra HBM round trip per source)
        sources = [jnp.moveaxis(x, -1, 1)] + [
            jnp.moveaxis(_static_rotate(x, r, padding_mode), -1, 1)
            for r in residues[1:]
        ]
        out = _pallas_selectn(
            tuple(sources), src_idx, k_idx, interpret=interpret,
            strategy=_rot90_strategy(), bt=_pair_batch(),
        )
        return jnp.moveaxis(out, 1, -1)
    sources = jnp.moveaxis(x, -1, 1)[None]  # (1, B, C, H, W)
    out = _pallas_select(
        sources, src_idx, k_idx, interpret=interpret,
        strategy=_rot90_strategy(),
    )
    return jnp.moveaxis(out, 1, -1)


def _blend_ref(x: Array, idx: Array, num_rotations: int, sign: float, padding_mode: str) -> Array:
    from equiadapt_tpu.ops.warp import rotate_discrete

    onehot = jax.nn.one_hot(idx, num_rotations, dtype=x.dtype)
    return rotate_discrete(x, onehot, num_rotations, sign, padding_mode)


def _rotate_select_impl(x, idx, num_rotations, sign, padding_mode, mode):
    on_tpu_square = (
        jax.default_backend() == "tpu"
        # the kernels tile their grid on the batch, so the batch dim must
        # be concrete; under shape-polymorphic export (utils/export.py
        # symbolic_batch=True) it is a symbolic expression and the select
        # falls back to the XLA blend formulations, which trace
        # polymorphically — fast-mode serving graphs now export at any
        # batch size
        and isinstance(x.shape[0], int)
        and x.shape[1] == x.shape[2]
        and len(_c_n_decomposition(num_rotations, sign)[0]) <= 4
    )
    # Thin-channel batches (images: C<=4) can go through the NHWC-native
    # interleaved kernel — zero transpose copies on either side, but the
    # in-kernel de-interleave matmuls for odd quarter-turns are VPU/MXU
    # heavy; opt-in via EQUIADAPT_SELECT_LAYOUT=nhwc until it beats the
    # NCHW kernel on hardware (round-4 A/B: the NCHW-spine arrangement
    # still wins at C=3/224px). Wide fibers (regular reps, C=16+) always
    # keep the NCHW kernel — the interleave algebra scales with C^2.
    from equiadapt_tpu.kernel_options import current_kernel_options

    use_ilv = (
        on_tpu_square
        and x.shape[-1] <= 4
        and current_kernel_options().select_layout == "nhwc"
    )
    if mode == "fast":
        # round-3 crossover (loop-amortized measurement, docs/
        # benchmarking.md): with 3-plane blocks the steered kernel beats
        # the XLA rot90 blends at C=3 too (the round-2 chained measurement
        # that favored XLA at thin channels was flattered by moveaxis
        # cancellation between iterations), so every square select goes
        # through pallas
        if use_ilv:
            return pallas_rotate_select_nhwc(
                x, idx, num_rotations, sign, padding_mode, mode="fast"
            )
        if on_tpu_square:
            return pallas_rotate_select(
                x, idx, num_rotations, sign, padding_mode, mode="fast"
            )
        from equiadapt_tpu.ops.warp import rotate_select_fast

        return rotate_select_fast(x, idx, num_rotations, sign, padding_mode)
    if use_ilv:
        return pallas_rotate_select_nhwc(
            x, idx, num_rotations, sign, padding_mode, mode="exact"
        )
    if on_tpu_square:
        return pallas_rotate_select(x, idx, num_rotations, sign, padding_mode)
    return _blend_ref(x, idx, num_rotations, sign, padding_mode)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def rotate_select(
    x: Array,
    idx: Array,
    num_rotations: int,
    sign: float = -1.0,
    padding_mode: str = "border",
    mode: str = "exact",
) -> Array:
    """Backend-dispatching single-pass select.

    mode="exact": pallas NCHW kernel on TPU, static-tap blend elsewhere —
    bit-identical to `rotate_discrete` with a hard one-hot.
    mode="fast": two-pass MXU residual + rot90 one-hot blend
    (ops/warp.rotate_select_fast) on every backend — 90-degree elements stay
    bit-exact, odd C8 elements carry the documented two-pass interpolation
    residual.

    Differentiable in `x` via a custom VJP: the op is linear in x, so the
    backward pass is the linear transpose of the matching forward
    formulation. No gradient flows to `idx` (matches the reference's hard
    selection in invert, images/utils.py:28).
    """
    return _rotate_select_impl(x, idx, num_rotations, sign, padding_mode, mode)


def _rs_fwd(x, idx, num_rotations, sign, padding_mode, mode):
    out = _rotate_select_impl(x, idx, num_rotations, sign, padding_mode, mode)
    # zero-size token carries x's shape/dtype into bwd without retaining x
    token = jnp.zeros((0,) + x.shape, x.dtype)
    return out, (idx, token)


def _rs_bwd(num_rotations, sign, padding_mode, mode, res, g):
    idx, token = res
    if mode == "fast":
        from equiadapt_tpu.ops.warp import rotate_select_fast

        f = lambda xx: rotate_select_fast(xx, idx, num_rotations, sign, padding_mode)
    else:
        f = lambda xx: _blend_ref(xx, idx, num_rotations, sign, padding_mode)
    spec = jax.ShapeDtypeStruct(token.shape[1:], token.dtype)
    (dx,) = jax.linear_transpose(f, spec)(g)
    d_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return dx, d_idx


rotate_select.defvjp(_rs_fwd, _rs_bwd)
