"""Kernel-path configuration: one typed, validated switchboard.

Round-4 verdict item: six ``EQUIADAPT_*`` env vars were read ad-hoc inside
model/op code (``discrete_group.py``, ``ops/warp.py``,
``ops/pallas/select_warp.py``), which bred untested knob combinations — the
round-4 TPU kernel fault shipped through exactly such a combination. All
kernel-path switches now live here as a frozen dataclass with field
validation, settable either process-wide via the same env vars (kept for
backward compatibility, still validated) or scoped via the
``kernel_options(...)`` context manager:

    with kernel_options(bilinear_gather="slab"):
        y = canonicalizer.apply(params, x)

Resolution order: innermost active ``kernel_options`` context > env var >
dataclass default. Every option is resolved OUTSIDE jitted kernels and baked
into the trace as a static choice (flipping an option or env var never hits
a stale jit cache for option-keyed entry points; canonicalizer ``apply``
calls trace the option at jit-trace time like any other Python-level
config).

The tested matrix lives in ``tests/test_kernel_options.py`` (CPU interpret
mode, cross product of the image-path knobs) and ``bench.py --smoke`` (one
real-hardware pass of every mode x path each round).
"""

from __future__ import annotations

import dataclasses
import os
import threading
from contextlib import contextmanager
from typing import Iterator, Tuple

__all__ = ["KernelOptions", "kernel_options", "current_kernel_options"]

_ALLOWED: dict = {
    "bilinear_gather": ("taps", "slab"),
    "nchw_spine": ("never", "auto", "interpret"),
    "spine_barrier": ("auto", "never"),
    "select_layout": ("nchw", "nhwc"),
    "rot90_strategy": ("mixed", "fp32"),
}


@dataclasses.dataclass(frozen=True)
class KernelOptions:
    """Static kernel-path switches for the image canonicalizers.

    bilinear_gather: dynamic-coordinate bilinear sampling form
        (``ops/warp.bilinear_sample``). "taps" = four per-tap row gathers
        (validated default); "slab" = paired 2C-wide slice gathers —
        bit-identical in isolation and lower index traffic, but the fused
        continuous-exact graph with slab faulted the TPU worker in round 4
        (BENCH_r04.json rc=1), so it is opt-in until re-proven on hardware.
    nchw_spine: eval fast-mode NCHW-spine dispatch in
        ``DiscreteGroupImageCanonicalization`` ("never" default — the
        hybrid generic path measured faster in round 4; "auto" enables on
        TPU; "interpret" forces the branch through interpret-mode kernels
        so CPU tests can drive it end-to-end).
    spine_barrier: materialize the spine's cast+transpose once via
        ``optimization_barrier`` ("auto") or let XLA fork it ("never").
    select_pair: batch samples per grid step in the pallas select kernels
        (>= 1; 2 halves DMA-issue cost — round-4 measurement).
    select_layout: thin-channel select kernel layout ("nchw" default;
        "nhwc" = interleaved NHWC-native kernel, opt-in until it wins on
        hardware).
    rot90_strategy: in-kernel rot90 lowering ("mixed" keeps bf16 payloads
        bf16; "fp32" = exchange-matrix reversals on fp32 operands).
    exact_warp: continuous-family exact-mode warp implementation
        ("pallas" = in-VMEM gather-compose kernel
        (``ops/pallas/bilinear_warp.py``) on TPU for eval, XLA elsewhere;
        "xla" = always the dynamic-gather ``bilinear_sample`` form;
        "interpret" = force the pallas kernel in interpret mode on any
        backend — lets the CPU suite drive the FUSED canonicalize graph
        through the kernel, the round-4 lesson that standalone-op checks
        miss fused-graph failures).
    """

    bilinear_gather: str = "taps"
    nchw_spine: str = "never"
    spine_barrier: str = "auto"
    select_pair: int = 2
    select_layout: str = "nchw"
    rot90_strategy: str = "mixed"
    exact_warp: str = "pallas"

    def __post_init__(self) -> None:
        for name, allowed in _ALLOWED.items():
            val = getattr(self, name)
            if val not in allowed:
                raise ValueError(
                    f"KernelOptions.{name} must be one of {allowed}, got {val!r}"
                )
        if self.exact_warp not in ("pallas", "xla", "interpret"):
            raise ValueError(
                "KernelOptions.exact_warp must be 'pallas', 'xla' or "
                f"'interpret', got {self.exact_warp!r}"
            )
        if not isinstance(self.select_pair, int) or self.select_pair < 1:
            raise ValueError(
                f"KernelOptions.select_pair must be an int >= 1, got {self.select_pair!r}"
            )


_ENV_PREFIX = "EQUIADAPT_"


def _env_key(field_name: str) -> str:
    return _ENV_PREFIX + field_name.upper()


_tls = threading.local()


def _stack(create: bool = False):
    items = getattr(_tls, "items", None)
    if items is None and create:
        items = []
        _tls.items = items
    return items


def current_kernel_options() -> KernelOptions:
    """The active options: innermost ``kernel_options`` context if any,
    else env-var overrides over the defaults (validated either way)."""
    items = _stack()
    if items:
        return items[-1]
    kw = {}
    for f in dataclasses.fields(KernelOptions):
        raw = os.environ.get(_env_key(f.name))
        if raw is None:
            continue
        if f.type in (int, "int"):
            try:
                kw[f.name] = int(raw)
            except ValueError:
                raise ValueError(
                    f"{_env_key(f.name)} must be an integer, got {raw!r}"
                ) from None
        else:
            kw[f.name] = raw
    return KernelOptions(**kw)


@contextmanager
def kernel_options(**overrides) -> Iterator[KernelOptions]:
    """Scoped kernel-path overrides (thread-local, re-entrant)."""
    base = current_kernel_options()
    opts = dataclasses.replace(base, **overrides)
    items = _stack(create=True)
    items.append(opts)
    try:
        yield opts
    finally:
        items.pop()


def option_matrix() -> Tuple[KernelOptions, ...]:
    """The supported image-path knob combinations, for matrix tests and
    the per-round hardware smoke (``bench.py --smoke``)."""
    combos = []
    for gather in _ALLOWED["bilinear_gather"]:
        for spine in ("never", "interpret"):
            for layout in _ALLOWED["select_layout"]:
                combos.append(
                    KernelOptions(
                        bilinear_gather=gather,
                        nchw_spine=spine,
                        select_layout=layout,
                    )
                )
    return tuple(combos)
