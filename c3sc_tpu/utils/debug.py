"""Debug-mode helpers (SURVEY.md §5: the race-detection/sanitizer row).

Pure-functional JAX has no data races; the equivalent failure mode is NaN
propagation through the while_loop state. Enable NaN checking + disabling
of jit fusion for test/debug runs.
"""

from __future__ import annotations

import jax


def enable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", True)


def disable_nan_checks() -> None:
    jax.config.update("jax_debug_nans", False)


def debug_context():
    """Context manager: NaN checks + eager (disable_jit) execution."""
    import contextlib

    @contextlib.contextmanager
    def ctx():
        enable_nan_checks()
        with jax.disable_jit():
            yield
        disable_nan_checks()

    return ctx()
