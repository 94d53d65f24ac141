"""Analytic FLOP counting by jaxpr traversal.

``jax.jit(...).lower().cost_analysis()`` returns no usable ``flops`` entry
on the axon TPU backend (round-4 verdict item 4: the MFU fields shipped
null). This module counts matmul/conv FLOPs analytically instead: trace the
function to a jaxpr and sum ``2 * macs`` over every ``dot_general`` and
``conv_general_dilated`` equation, recursing into call/control-flow
primitives (pjit, custom_jvp/vjp, scan/while/cond multiply by trip count
where static, remat). Elementwise work is deliberately excluded — MFU is a
matmul-unit utilization number, and the MXU terms dominate every model here
(ResNet-50 at 224px is ~4.1 GFLOP/img of conv against ~0.1 GFLOP of
elementwise).

Scan trip counts are static in jaxprs (``length`` param), so training loops
count exactly. ``while_loop`` bodies count as ONE iteration (trip count is
dynamic); none of the benched step functions use while loops.
"""

from __future__ import annotations

import math
from functools import reduce
from typing import Any

import jax
from jax.extend import core as jcore

__all__ = ["count_flops", "jaxpr_flops"]


def _prod(xs) -> int:
    return reduce(lambda a, b: a * int(b), xs, 1)


def _dot_general_flops(eqn) -> int:
    lhs_aval, rhs_aval = eqn.invars[0].aval, eqn.invars[1].aval
    (lhs_c, rhs_c), (lhs_b, _rhs_b) = eqn.params["dimension_numbers"]
    lshape = lhs_aval.shape
    batch = _prod(lshape[d] for d in lhs_b)
    contract = _prod(lshape[d] for d in lhs_c)
    lhs_free = _prod(
        d
        for i, d in enumerate(lshape)
        if i not in lhs_c and i not in lhs_b
    )
    rshape = rhs_aval.shape
    rhs_free = _prod(
        d
        for i, d in enumerate(rshape)
        if i not in rhs_c and i not in _rhs_b
    )
    return 2 * batch * lhs_free * rhs_free * contract


def _conv_flops(eqn) -> int:
    lhs, rhs = eqn.invars[0].aval, eqn.invars[1].aval
    out = eqn.outvars[0].aval
    dn = eqn.params["dimension_numbers"]
    fg = int(eqn.params.get("feature_group_count", 1))
    bg = int(eqn.params.get("batch_group_count", 1))
    # out spatial x out channels x batch x (kernel spatial x in-ch/group)
    out_spatial = _prod(out.shape[d] for d in dn.out_spec[2:])
    out_feat = out.shape[dn.out_spec[1]]
    batch = out.shape[dn.out_spec[0]]
    k_spatial = _prod(rhs.shape[d] for d in dn.rhs_spec[2:])
    in_feat_per_group = lhs.shape[dn.lhs_spec[1]] // (fg * bg) * bg
    return 2 * batch * out_spatial * out_feat * k_spatial * in_feat_per_group


_CALL_JAXPR_PARAMS = ("jaxpr", "call_jaxpr", "fun_jaxpr", "cond_jaxpr")


def jaxpr_flops(jaxpr: Any) -> int:
    """Total matmul+conv FLOPs of a (closed) jaxpr."""
    if isinstance(jaxpr, jcore.ClosedJaxpr):
        jaxpr = jaxpr.jaxpr
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_general_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            length = int(eqn.params.get("length", 1))
            total += length * jaxpr_flops(eqn.params["jaxpr"])
        elif name == "while":
            total += jaxpr_flops(eqn.params["body_jaxpr"])
        elif name == "cond":
            branches = eqn.params.get("branches", ())
            if branches:
                total += max(jaxpr_flops(b) for b in branches)
        else:
            # generic recursion into call-like primitives (pjit, remat,
            # custom_jvp/vjp, named_call, closed_call, pallas has none)
            for key in _CALL_JAXPR_PARAMS:
                sub = eqn.params.get(key) if eqn.params else None
                if sub is not None and hasattr(sub, "eqns") or isinstance(
                    sub, jcore.ClosedJaxpr
                ):
                    total += jaxpr_flops(sub)
                    break
            else:
                if eqn.params:
                    for val in eqn.params.values():
                        if isinstance(val, jcore.ClosedJaxpr):
                            total += jaxpr_flops(val)
    return total


def count_flops(fn, *args, **kwargs) -> float:
    """Matmul+conv FLOPs of one call of ``fn(*args, **kwargs)``.

    Tracing happens on the host (abstract values only — no device compile,
    no data movement); safe to call on full-size benchmark arguments.
    """
    closed = jax.make_jaxpr(fn)(*args, **kwargs)
    return float(jaxpr_flops(closed))


def resnet50_eval_flops(batch: int, image: int = 224) -> float:
    """Closed-form sanity anchor: torchvision-style ResNet-50 forward is
    ~4.09 GMAC at 224px per image — 8.18 GFLOP in the 2x-MAC convention
    used throughout this module (and by MFU accounting)."""
    return 8.18e9 * batch * (image / 224.0) ** 2
