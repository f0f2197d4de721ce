"""Persistent XLA compilation cache setup.

On the axon-tunneled TPU, first compiles of the fused 6D sweep take minutes;
the persistent cache makes repeat runs (bench, CLI, MPC restarts) start hot.
Call once before building solvers; safe to call multiple times.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get(
        "C3SC_COMPILE_CACHE", os.path.expanduser("~/.cache/c3sc_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
