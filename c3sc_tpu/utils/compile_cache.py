"""Persistent XLA compilation cache setup.

On the axon-tunneled TPU, first compiles of the fused 6D sweep take minutes;
the persistent cache makes repeat runs (bench, CLI, MPC restarts) start hot.
Call once before building solvers; safe to call multiple times.
"""

from __future__ import annotations

import hashlib
import os


def _host_fingerprint() -> str:
    """Fingerprint of the host CPU feature set. The persistent cache stores
    CPU AOT executables; loading one compiled for a different ISA extension
    set SIGILLs in the loader (observed as cpu_aot_loader warnings on every
    run after a machine swap — r2 verdict hygiene). Keying the cache dir by
    the flags makes a foreign cache invisible instead of half-loadable."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("C3SC_COMPILE_CACHE")
    if path is None:
        path = os.path.expanduser(
            f"~/.cache/c3sc_tpu_xla-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
