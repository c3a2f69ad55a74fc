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

import jax

if not os.environ.get("MGBTPU_NO_X64"):
    try:  # pragma: no cover - trivial
        jax.config.update("jax_enable_x64", True)
    except Exception:
        pass


def default_dtype():
    """float64 when x64 is enabled (CPU path), else float32 (TPU path)."""
    import numpy as np

    return np.float64 if jax.config.read("jax_enable_x64") else np.float32


def eps(dtype) -> float:
    import numpy as np

    return float(np.finfo(np.dtype(dtype)).eps)
