"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding tests run against
XLA's host-platform device partitioning (the standard JAX testing recipe).

The environment pre-imports jax via a sitecustomize hook and pins
JAX_PLATFORMS to the slow single-chip tunnel, so plain env mutation is too
late — use jax.config.update, which takes effect as long as no backend has
been initialized yet (pytest collection does not touch devices).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent compile cache: the suite is dominated by XLA:CPU compiles of
# the 8-device SPMD programs; warm runs skip them entirely. Machine-local
# (gitignored) — XLA:CPU AOT artifacts bake in host CPU features.
try:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache_cpu"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
except Exception:
    pass


def pytest_sessionstart(session):
    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() == 8, jax.devices()
