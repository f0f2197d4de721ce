"""Aux subsystems: checkpoint/resume, metrics, config (SURVEY.md §5)."""

from c3sc_tpu.utils.checkpoint import (
    fused_context,
    load_fused_carry,
    load_solver_state,
    save_fused_carry,
    save_solver_state,
)
from c3sc_tpu.utils.metrics import MetricsLogger

__all__ = [
    "save_solver_state", "load_solver_state",
    "save_fused_carry", "load_fused_carry", "fused_context",
    "MetricsLogger",
]
