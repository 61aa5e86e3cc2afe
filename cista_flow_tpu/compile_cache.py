"""Persistent XLA compilation cache for the CLI entry points.

The serving/training graphs here are large (windowed scan over the full
composite; BPTT phase graphs) and identical across process restarts, so a
persistent cache turns the 20-40 s first-compile into a sub-second load on
every non-first run (bench reruns, resumed quality loops, the driver's
round-end bench).

Enabled by default only on TPU: the XLA:CPU AOT cache in this image is
unreliable across processes (host-feature-mismatch load rejections), so CPU
runs opt in explicitly via ``CISTA_CPU_CACHE=1`` (the trajectory-equivalence
test manages its own CPU cache dir for the same reason).

The reference has no analogous subsystem (eager torch); this is TPU-native
runtime infrastructure.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = "/tmp/cista_jax_cache"
_enabled = False


def enable(path: str | None = None) -> bool:
    """Idempotently point JAX's persistent compilation cache at ``path``.

    Returns True when the cache is active for this process.
    """
    global _enabled
    if _enabled:
        return True
    if os.environ.get("CISTA_NO_COMPILE_CACHE"):
        return False
    import jax

    if jax.default_backend() != "tpu" and not os.environ.get(
            "CISTA_CPU_CACHE"):
        return False
    path = path or os.environ.get("CISTA_COMPILE_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    _enabled = True
    return True
