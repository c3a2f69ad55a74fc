"""Global configuration for mgbtpu.

The reference package (sloisel/MultiGridBarrier.jl) is Float64-throughout
(default solver tolerance ``sqrt(eps(T))``, see reference ``src/mgb.jl:96``).
On CPU we therefore enable x64 so golden-value parity tests hold to 1e-6.
TPU v5e has no hardware f64; on-TPU solves run in float32 with the
Float32-reference semantics (``tol = sqrt(eps(float32))``).

x64 is enabled at import unless MGBTPU_NO_X64 is set (it must happen before
any JAX array is created).
"""
from __future__ import annotations

import os

# XLA:CPU's fusion emitters (jaxlib 0.9.0) infinite-loop at execution on the
# double-float barrier graphs (deep chains of error-free transforms; repro:
# the level f0 with a DD Dz carried into both the barrier and linear terms).
# The legacy emitters are correct; only the CPU backend is affected. Must be
# set before the CPU client is created.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_cpu_use_fusion_emitters" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_cpu_use_fusion_emitters=false").strip()

import jax

if not os.environ.get("MGBTPU_NO_X64"):
    try:  # pragma: no cover - trivial
        jax.config.update("jax_enable_x64", True)
    except Exception:
        pass

# TPU matmul precision: float32 matmuls on TPU default to bf16 passes, which
# destroys the Newton-system accuracy (the barrier Hessian SYRK, the panel
# einsums, and the factorizations all run through the MXU). HIGHEST selects
# the multi-pass scheme with full f32 accuracy.
try:  # pragma: no cover - trivial
    jax.config.update("jax_default_matmul_precision", "highest")
except Exception:
    pass

def host_fingerprint() -> str:
    """Stable fingerprint of the HOST CPU's feature set.

    XLA:CPU AOT executables record the compile machine's features; loading
    one on a host with a different feature set can SIGILL (the loader only
    warns). ``platform.machine()`` is far too coarse (every x86_64 VM
    collides), so hash the /proc/cpuinfo flags line — the actual feature
    exposure — falling back to platform identifiers elsewhere."""
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux
        feats = platform.processor()
    return hashlib.sha1(
        (platform.machine() + "|" + feats).encode()).hexdigest()[:10]


def _default_cache_root() -> str:
    """Repo-local cache root: /tmp is wiped on VM restart, which makes every
    new host pay minutes of cold TPU compiles (L=6 warm-up was 372 s cold vs
    seconds warm). The package directory survives restarts, so compiled
    executables and AOT exports keyed there stay warm across hosts; falls
    back to /tmp when the package tree is read-only (verified by a write
    probe, not just makedirs: an existing read-only .cache must not be
    returned)."""
    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".cache")
    try:
        os.makedirs(root, exist_ok=True)
        probe = os.path.join(root, ".wprobe")
        with open(probe, "w"):
            pass
        os.unlink(probe)
        return root
    except OSError:  # pragma: no cover - read-only install
        return "/tmp/mgbtpu_cache"


# Persistent compilation cache: the jitted Newton programs are large (nested
# while loops + factorizations) and TPU compilation through the remote
# tunnel is minutes per level; cache compiled executables across processes.
def enable_compile_cache(path=None):
    """Persistent compilation cache: the jitted Newton programs are large and
    TPU compilation through the remote tunnel is slow; cache compiled
    executables across processes. Opt-in (bench/graft entry call this on the
    TPU path). CPU-backend processes get a per-host-CPU-feature namespace:
    XLA:CPU AOT artifacts bake compile-machine features and can SIGILL on a
    feature-mismatched host (the repo-local cache survives VM changes, so
    this is a real cross-host hazard, not a theoretical one); TPU
    executables are target-compiled and shared."""
    try:  # pragma: no cover - environment dependent
        d = path or os.environ.get("MGBTPU_COMPILE_CACHE")
        if d is None:
            d = _default_cache_root() + "/jaxcache"
            if jax.default_backend() == "cpu":
                d += "_cpu_" + host_fingerprint()
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def default_dtype():
    """float64 when x64 is enabled (CPU path), else float32 (TPU path)."""
    import numpy as np

    return np.float64 if jax.config.read("jax_enable_x64") else np.float32


def eps(dtype) -> float:
    import numpy as np

    return float(np.finfo(np.dtype(dtype)).eps)
