"""Profiling helpers: jax.profiler traces around the canonicalize /
predict / invert stages (SURVEY.md §5 aux-subsystem requirement).

The hot paths are already annotated with `jax.named_scope`
(images/canonicalization/discrete_group.py: canon/get_group_activations,
canon/select_element, canon/warp, canon/invert), so a captured trace groups
device time by stage out of the box. This module adds the capture plumbing:

    from equiadapt_tpu.utils.profiling import profile_trace

    with profile_trace("/tmp/eqt_trace"):
        state, metrics = train_step(state, batch, rng)
        jax.block_until_ready(metrics)

View with TensorBoard's profile plugin or xprof. The reference has no
profiling support at all (SURVEY.md §5: only wandb.watch gradient
histograms); this is the TPU-native equivalent capability.
"""

from __future__ import annotations

import contextlib
from typing import Iterator, Optional

import jax

__all__ = ["profile_trace", "annotate", "device_op_attribution"]


@contextlib.contextmanager
def profile_trace(
    log_dir: str,
    enabled: bool = True,
    create_perfetto_link: bool = False,
) -> Iterator[None]:
    """Capture a jax.profiler device trace for the enclosed block.

    No-op when `enabled` is False, so call sites can key it off a config
    flag (ExperimentConfig.profile) without branching.
    """
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str, enabled: bool = True) -> Iterator[None]:
    """Host-side trace annotation (shows as a named span in the profile).

    Inside jitted code use `jax.named_scope` instead — these compose: the
    host annotation brackets dispatch, the named scopes label device ops.
    """
    if not enabled:
        yield
        return
    with jax.profiler.TraceAnnotation(name):
        yield


def device_memory_stats(device: Optional[jax.Device] = None) -> dict:
    """Live / peak HBM usage of a device (empty dict if unsupported)."""
    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", None)
    try:
        return dict(stats()) if callable(stats) else {}
    except Exception:
        return {}


def device_op_attribution(trace_dir: str, top: int = 40) -> list:
    """Synchronous per-op device times from a `profile_trace` capture.

    Parses the newest xplane.pb under `trace_dir` with
    `jax.profiler.ProfileData` and aggregates the "XLA Ops" line of the
    device plane (TPU when present, otherwise the host-CPU plane), sorted
    descending. "Async XLA Ops" (overlapping DMAs) are excluded — summing
    them double-counts overlapped time.

    This is the tool behind the wrapper-overhead attribution tables in
    docs/benchmarking.md:

        with profile_trace("/tmp/t"):
            float(jax.jit(step)(...))            # force completion
        for name, ms in device_op_attribution("/tmp/t")[:10]:
            print(f"{ms:8.3f} ms  {name}")

    Returns:
        [(op_name, total_ms)] rows, most expensive first.
    """
    import pathlib

    pbs = sorted(pathlib.Path(trace_dir).rglob("*.xplane.pb"))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    pd = jax.profiler.ProfileData.from_serialized_xspace(pbs[-1].read_bytes())
    planes = list(pd.planes)
    device_planes = [p for p in planes if "TPU" in p.name] or [
        p for p in planes if "CPU" in p.name or "Host Threads" in p.name
    ]
    agg: dict = {}
    for plane in device_planes:
        is_tpu = "TPU" in plane.name
        for line in plane.lines:
            # TPU planes: only the synchronous "XLA Ops" line. CPU planes
            # have no such line — take every host-thread line (smoke-level
            # attribution only; real numbers come from the TPU plane).
            if is_tpu and line.name != "XLA Ops":
                continue
            for ev in line.events:
                agg[ev.name] = agg.get(ev.name, 0) + ev.duration_ns
        if agg:
            break
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:top]
    return [(name, ns / 1e6) for name, ns in rows]
