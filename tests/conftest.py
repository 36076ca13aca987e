"""Test configuration: force CPU with an 8-device virtual mesh.

Multi-chip TPU hardware is unavailable in CI, so sharding/collective tests run
against XLA's host-platform device virtualization; the kernels themselves are
platform-agnostic (same code path compiles for TPU). The axon sitecustomize
registers a remote-TPU backend that overrides JAX_PLATFORMS, so the platform
must also be forced through jax.config after import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent XLA compile cache: the suite is compile-bound on CPU CI (one
# core), and the kernels are trace-time-specialized per robot, so repeat
# runs recompile identical programs. ~2.6x wall-clock on warm runs.
_cache_dir = os.path.join(os.path.dirname(__file__), os.pardir,
                          ".cache", "jax")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
