"""Test configuration: force CPU with an 8-device virtual mesh and x64.

This environment registers a TPU ("axon") PJRT plugin via sitecustomize and
sets ``jax_platforms="axon,cpu"`` programmatically, which overrides the
JAX_PLATFORMS env var; tests must run on CPU (golden-value parity with the
Float64 reference needs x64, and the TPU tunnel serializes processes), so we
flip the platform through the config API before any backend initializes.
The sharding tests use a virtual 8-device CPU mesh.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_use_fusion_emitters" not in flags:
    # jaxlib 0.9.0 XLA:CPU fusion emitters infinite-loop on the df64 barrier
    # graphs (see mgbtpu/_config.py)
    flags = (flags + " --xla_cpu_use_fusion_emitters=false").strip()
os.environ["XLA_FLAGS"] = flags
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compile cache: the dd Newton/ramp programs take minutes of
# XLA:CPU compile; cache them across test runs. Keyed per user and per
# host-CPU FEATURE SET (mgbtpu._config.host_fingerprint hashes the
# /proc/cpuinfo flags line — platform.machine() collides across every
# x86_64 VM, and XLA:CPU AOT artifacts compiled with other machine
# features can SIGILL on load), and an explicit JAX_COMPILATION_CACHE_DIR
# wins.
try:  # pragma: no cover - environment dependent
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        import tempfile

        from mgbtpu._config import host_fingerprint

        cache = os.path.join(
            tempfile.gettempdir(),
            f"mgbtpu_testcache_{os.getuid()}_{host_fingerprint()}")
        jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover - depends on harness
    from jax.extend.backend import clear_backends

    clear_backends()
